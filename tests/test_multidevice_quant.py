"""End-to-end quantify on the 8-device virtual mesh: the automatic
multi-device path must reproduce single-device results."""

import os

import jax
import numpy as np
import pytest

from salmon_tpu.constants import SalmonDefaults
from salmon_tpu.index.builder import build_index
from salmon_tpu.quant import quantify


def test_quantify_uses_mesh_and_matches(sample_data_dir, monkeypatch):
    assert len(jax.devices()) == 8
    idx = build_index(os.path.join(sample_data_dir, "transcripts.fasta"),
                      k=25)
    o = SalmonDefaults()
    o.reads_per_batch = 4096

    r_multi = quantify(idx, "IU",
                       [os.path.join(sample_data_dir, "reads_1.fastq")],
                       [os.path.join(sample_data_dir, "reads_2.fastq")],
                       opts=o, progress=False)

    # force the single-device path by hiding the extra devices
    import salmon_tpu.quant as q

    class _FakeJax:
        devices = staticmethod(lambda: [jax.devices()[0]])
    monkeypatch.setattr(jax, "devices", lambda: [object()])
    r_single = quantify(idx, "IU",
                        [os.path.join(sample_data_dir, "reads_1.fastq")],
                        [os.path.join(sample_data_dir, "reads_2.fastq")],
                        opts=o, progress=False)

    assert r_multi.num_mapped == r_single.num_mapped == 10000
    np.testing.assert_allclose(r_multi.counts, r_single.counts,
                               rtol=1e-3, atol=0.5)
