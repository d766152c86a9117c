import sys

from salmon_tpu.cli import main

sys.exit(main())
