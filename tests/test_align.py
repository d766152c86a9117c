"""Banded affine-gap DP: JAX kernel vs scalar reference, and known-score
cases (ma=2 mp=-4 go=6 ge=2 — the reference ksw2 defaults)."""

import jax.numpy as jnp
import numpy as np
import pytest

from salmon_tpu.mapping.align import banded_scores, banded_scores_numpy

MA, MP, GO, GE = 2.0, -4.0, 6.0, 2.0
BW = 15


def _run_jax(read, ref, ref_base=0, bw=BW):
    P, L = 1, len(read)
    seq = np.asarray(ref, dtype=np.uint8)
    out = banded_scores(
        jnp.asarray(np.asarray(read, np.uint8)[None, :]),
        jnp.asarray([L], jnp.int32),
        jnp.asarray([ref_base], jnp.int32),
        jnp.asarray([len(ref)], jnp.int32),
        jnp.asarray(seq), jnp.asarray([0], jnp.int32),
        bw, MA, MP, GO, GE)
    return float(out[0])


def test_perfect_match():
    read = [0, 1, 2, 3] * 5
    assert _run_jax(read, read) == 2.0 * len(read)


def test_single_mismatch():
    read = np.array([0, 1, 2, 3] * 5)
    ref = read.copy()
    ref[7] = (ref[7] + 1) % 4
    assert _run_jax(read, ref) == 2.0 * (len(read) - 1) - 4.0


def test_offset_start_within_band():
    """Read actually starts 3 bases later than predicted: free band offset
    absorbs it with no penalty."""
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, 60)
    read = ref[3:3 + 30]
    assert _run_jax(read, ref, ref_base=0) == 60.0


def test_deletion_gap():
    """Read skips 2 ref bases mid-way: score = matches - go - 2*ge."""
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 4, 50)
    read = np.concatenate([ref[:20], ref[22:40]])  # 38 bases, 2-del
    got = _run_jax(read, ref)
    assert got == 2.0 * 38 - (GO + 2 * GE)


def test_insertion_gap():
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 4, 50)
    read = np.concatenate([ref[:20], [0, 0], ref[20:38]])
    read[20] = (ref[20] + 2) % 4  # ensure inserted bases differ
    read[21] = (ref[20] + 2) % 4
    got = _run_jax(read, ref)
    # insertion of 2 (gap in ref): matches 38*2 - (go + 2*ge)
    assert got >= 2.0 * 38 - (GO + 2 * GE) - 1e-6


def test_matches_scalar_reference_random():
    rng = np.random.default_rng(3)
    for trial in range(20):
        L = int(rng.integers(20, 60))
        ref = rng.integers(0, 4, L + 30)
        read = ref[5:5 + L].copy()
        # random edits
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, L))
            read[p] = (read[p] + rng.integers(1, 4)) % 4
        got = _run_jax(read, ref, ref_base=5)
        want = banded_scores_numpy(read, ref[5:], BW, MA, MP, GO, GE)
        assert got == pytest.approx(want), (trial, got, want)


def test_batch_of_problems():
    rng = np.random.default_rng(4)
    seqs = rng.integers(0, 4, 500).astype(np.uint8)
    reads, bases, lens = [], [], []
    for i in range(8):
        start = int(rng.integers(0, 400))
        reads.append(seqs[start:start + 40])
        bases.append(start)
        lens.append(40)
    out = banded_scores(
        jnp.asarray(np.stack(reads)), jnp.asarray(lens, jnp.int32),
        jnp.asarray(bases, jnp.int32),
        jnp.asarray([500] * 8, jnp.int32), jnp.asarray(seqs),
        jnp.asarray([0] * 8, jnp.int32), BW, MA, MP, GO, GE)
    np.testing.assert_allclose(np.asarray(out), 80.0)


def test_packed_window_fetch_matches_bytes():
    """pack_seq4 + _fetch_windows_packed reproduce the byte-gather
    windows exactly (incl. unaligned starts). N bases (code 4) have no
    2-bit encoding and decode as the deterministic position fill
    (i & 3) — the comparison applies the same mapping."""
    import numpy as np
    from salmon_tpu.mapping.align import (_fetch_windows_packed,
                                          pack_seq4)
    rng = np.random.default_rng(7)
    seq = rng.integers(0, 5, 1000).astype(np.uint8)  # incl. N codes
    fill = (np.arange(seq.shape[0]) & 3).astype(np.uint8)
    expect = np.where(seq < 4, seq, fill)
    words, shift = pack_seq4(seq, lead_pad=256)
    W = 83
    starts = rng.integers(0, 900, 64).astype(np.int32)
    out = np.asarray(_fetch_windows_packed(
        jnp.asarray(words), jnp.asarray(starts + shift), W))
    for i, s in enumerate(starts):
        want = expect[s:s + W]
        np.testing.assert_array_equal(out[i, :want.shape[0]], want)


def test_banded_scores_packed_path_matches():
    """Full DP via the packed-word fetch equals the byte-gather path."""
    import numpy as np
    from salmon_tpu.mapping.align import banded_scores, pack_seq4
    rng = np.random.default_rng(8)
    seq = rng.integers(0, 4, 2000).astype(np.uint8)
    words, shift = pack_seq4(seq)
    n, L = 32, 40
    reads, bases = [], []
    for _ in range(n):
        s = int(rng.integers(0, 1900))
        r = seq[s:s + L].copy()
        r[int(rng.integers(0, L))] ^= 1
        reads.append(r)
        bases.append(s)
    args = (jnp.asarray(np.stack(reads)), jnp.asarray([L] * n, jnp.int32),
            jnp.asarray(bases, jnp.int32),
            jnp.asarray([2000] * n, jnp.int32), jnp.asarray(seq),
            jnp.asarray([0] * n, jnp.int32), BW, MA, MP, GO, GE)
    plain = np.asarray(banded_scores(*args))
    packed = np.asarray(banded_scores(
        *args, seq_words=jnp.asarray(words), seq_words_shift=shift))
    np.testing.assert_array_equal(plain, packed)


def _run_jax_opts(read, ref, ref_base=0, bw=BW, **kw):
    L = len(read)
    seq = np.asarray(ref, dtype=np.uint8)
    out = banded_scores(
        jnp.asarray(np.asarray(read, np.uint8)[None, :]),
        jnp.asarray([L], jnp.int32),
        jnp.asarray([ref_base], jnp.int32),
        jnp.asarray([len(ref)], jnp.int32),
        jnp.asarray(seq), jnp.asarray([0], jnp.int32),
        bw, MA, MP, GO, GE, **kw)
    return float(out[0])


def test_softclip_overhangs():
    """--softclipOverhangs: bases hanging off the transcript end are
    clipped for free (reference aconf.allowOverhangSoftclip)."""
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 40).tolist()
    # read = last 10 ref bases + 10 bases off the end
    read = ref[30:] + rng.integers(0, 4, 10).tolist()
    hard = _run_jax_opts(read, ref, ref_base=30)
    soft = _run_jax_opts(read, ref, ref_base=30, softclip_overhangs=True)
    # hard: best the DP can do is 10 matches then a 10-base insertion
    # (overhang cells are -1000): 20 - (6 + 2*10) = -6
    assert hard == 2.0 * 10 - (GO + GE * 10)
    assert soft == 2.0 * 10       # 10 matches + free clipped overhang


def test_softclip_read_ends():
    """--softclip: mismatching read ends may be clipped for free."""
    rng = np.random.default_rng(6)
    ref = rng.integers(0, 4, 80).tolist()
    read = list(ref[20:50])
    read[:5] = [(b + 1) % 4 for b in read[:5]]    # garbage prefix
    read[-5:] = [(b + 1) % 4 for b in read[-5:]]  # garbage suffix
    hard = _run_jax_opts(read, ref, ref_base=20)
    soft = _run_jax_opts(read, ref, ref_base=20, softclip=True)
    assert soft == 2.0 * 20              # ends clipped free
    assert hard < soft                   # ends forced to align/gap


def test_softclip_matches_scalar_reference_random():
    rng = np.random.default_rng(11)
    for trial in range(8):
        L = int(rng.integers(20, 60))
        ref = rng.integers(0, 4, L + 40)
        read = np.array(ref[20:20 + L])
        nmut = int(rng.integers(0, 6))
        for _ in range(nmut):
            i = int(rng.integers(0, L))
            read[i] = (read[i] + 1 + rng.integers(0, 3)) % 4
        for sc, so in ((True, False), (False, True), (True, True)):
            got = _run_jax_opts(read.tolist(), ref.tolist(), ref_base=20,
                                softclip=sc, softclip_overhangs=so)
            want = banded_scores_numpy(read, ref[20 - BW + BW:], BW, MA,
                                       MP, GO, GE, softclip=sc,
                                       softclip_overhangs=so)
            # numpy ref indexes ref so read[i] aligns near ref[i]
            want = banded_scores_numpy(read, np.array(ref[20:]), BW, MA,
                                       MP, GO, GE, softclip=sc,
                                       softclip_overhangs=so)
            assert got == want, (trial, sc, so, got, want)


def test_read_starts_window_equivalence(rng):
    """A problem whose content sits at rows [lo, lo+len) with
    ref_base - lo (the flip-based rc layout) scores identically to the
    same content left-aligned at rows [0, len) — across random reads,
    bands, and both clip modes."""
    from salmon_tpu.mapping.align import _banded_scores_impl

    L = 72
    P = 16
    ref = rng.integers(0, 4, 4000).astype(np.uint8)
    lens = rng.integers(30, L + 1, P).astype(np.int32)
    base = rng.integers(50, 3000, P).astype(np.int32)
    left = np.full((P, L), 4, np.uint8)
    right = np.full((P, L), 4, np.uint8)
    for i in range(P):
        n = lens[i]
        content = ref[base[i]:base[i] + n].copy()
        content[rng.integers(0, n, 3)] = rng.integers(0, 4, 3)
        left[i, :n] = content
        right[i, L - n:] = content
    for softclip in (False, True):
        s_left = _banded_scores_impl(
            jnp.asarray(left), None, jnp.asarray(lens),
            jnp.asarray(base), jnp.asarray([4000] * P, jnp.int32),
            jnp.asarray(ref), jnp.zeros(P, jnp.int32), BW, MA, MP, GO,
            GE, softclip=softclip)
        s_right = _banded_scores_impl(
            jnp.asarray(right), None, jnp.asarray(lens),
            jnp.asarray(base - (L - lens)),
            jnp.asarray([4000] * P, jnp.int32),
            jnp.asarray(ref), jnp.zeros(P, jnp.int32), BW, MA, MP, GO,
            GE, softclip=softclip,
            read_starts=jnp.asarray(L - lens))
        np.testing.assert_array_equal(np.asarray(s_left),
                                      np.asarray(s_right))
