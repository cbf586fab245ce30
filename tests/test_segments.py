"""Segment state machine vs a direct transliteration of the reference loop."""

import numpy as np

from fastsmc_tpu.engine import segments as seg


def reference_state_machine(sums, posterior, prob_threshold, from_pos, to_pos,
                            age_threshold):
    """Line-by-line transliteration of writePerPairOutputFastSMC
    (HMM.cpp:1179-1357) for one pair. Returns (start, end, score_sum, pps)."""
    out = []
    is_ibd = [False, False, False, False]   # levels 0..3
    start = [0, 0, 0, 0]
    posterior_ibd = 0.0
    pps = np.zeros(age_threshold, dtype=np.float64)
    prev_pps = np.zeros(age_threshold, dtype=np.float64)

    def emit(lvl, a, b, score, state_sums):
        out.append((a, b, score, state_sums.copy()))

    for pos in range(from_pos, to_pos):
        prev_pps = pps.copy()
        pps = pps + posterior[pos, :age_threshold]
        s = sums[pos]
        level = None
        if s >= 1000 * prob_threshold:
            level = 0
        elif s >= 100 * prob_threshold:
            level = 1
        elif s >= 10 * prob_threshold:
            level = 2
        elif s >= prob_threshold:
            level = 3
        if level is not None:
            if not is_ibd[level]:
                start[level] = pos
                pps = posterior[pos, :age_threshold].copy()
                for other in range(4):
                    if other != level and pos > from_pos and is_ibd[other]:
                        emit(other, start[other], pos - 1, posterior_ibd,
                             prev_pps)
                posterior_ibd = s
            else:
                posterior_ibd += s
            if pos == to_pos - 1:
                emit(level, start[level], to_pos - 1, posterior_ibd, pps)
                posterior_ibd = 0.0
            for other in range(4):
                is_ibd[other] = (other == level)
        else:
            for other in range(4):
                if is_ibd[other]:
                    emit(other, start[other], pos - 1, posterior_ibd, prev_pps)
                    posterior_ibd = 0.0
            is_ibd = [False] * 4
    return out


def test_state_machine_matches_reference_transliteration():
    rng = np.random.default_rng(42)
    T, K, P = 200, 8, 6
    age = K
    prob = 0.001
    for trial in range(5):
        # random posteriors with a mix of strong/weak regions
        post = rng.random((T, K, P)).astype(np.float32)
        post /= post.sum(axis=1, keepdims=True)
        scale = rng.choice([1e-6, 1e-2, 1e-1, 0.5, 1.0], size=(T, P))
        sums = (post[:, :4].sum(axis=1) * scale).astype(np.float32)
        got = seg.extract_segments(sums, prob, 0, post, age)
        for p in range(P):
            want = reference_state_machine(sums[:, p], post[:, :, p], prob,
                                           0, T, age)
            mine = [s for s in got if s.pair == p]
            assert len(mine) == len(want), f"trial {trial} pair {p}"
            for m, w in zip(mine, want):
                assert (m.start, m.end) == (w[0], w[1])
                np.testing.assert_allclose(m.score_sum, w[2], rtol=1e-5)
                np.testing.assert_allclose(m.pps, w[3], rtol=1e-4)


def test_state_threshold():
    disc = np.array([0, 30, 60, 90, 120], dtype=np.float32)
    assert seg.state_threshold(disc, 50, 4) == 2
    assert seg.state_threshold(disc, 30, 4) == 1
    assert seg.state_threshold(disc, 1000, 4) == 4


def test_levels():
    # values chosen away from float32 threshold boundaries
    s = np.array([[0.6, 0.06, 0.006, 0.0006, 0.00001]], dtype=np.float32)
    lvl = seg.levels_from_sums(s, 0.0005)
    assert lvl.tolist() == [[0, 1, 2, 3, 4]]


def test_device_extraction_matches_host():
    """extract_segments_device (in-jit levels/boundaries + indicator-einsum
    reductions) must reproduce the host path on random windows, including
    the batch-union window semantics (s0/s1 masking)."""
    rng = np.random.default_rng(7)
    T, K, P = 256, 8, 16
    prob = 0.001
    for trial, (s0, s1) in enumerate([(0, 256), (17, 201), (100, 101)]):
        post = rng.random((T, K, P)).astype(np.float32)
        post /= post.sum(axis=1, keepdims=True)
        scale = rng.choice([1e-6, 1e-2, 1e-1, 0.5, 1.0], size=(T, P))
        sums = (post[:, :4].sum(axis=1) * scale).astype(np.float32)

        want = seg.extract_segments(sums[s0:s1], prob, 5 + s0,
                                    post[s0:s1], K)
        got, cap = seg.extract_segments_device(
            sums, post, prob, s0, s1, 5, K, cap=8)  # tiny cap: growth path
        assert cap >= 8
        assert len(got) == len(want), f"window {trial}"
        for g, w in zip(got, want):
            assert (g.pair, g.start, g.end) == (w.pair, w.start, w.end)
            np.testing.assert_allclose(g.score_sum, w.score_sum, rtol=1e-5)
            np.testing.assert_allclose(g.pps, w.pps, rtol=1e-4)


def test_merge_packed_shards_equals_meshless():
    """Merging per-shard packed extraction rows must reproduce the
    meshless extraction over the same global [T, P] matrix: the shards
    partition the pair axis contiguously, so offset-adjusted boundary
    streams concatenate into the global pair-major stream."""
    import jax
    from fastsmc_tpu.engine import segments as seg

    rng = np.random.default_rng(3)
    T, P, S = 128, 32, 4
    cap = 256
    th = rng.random((T, P)).astype(np.float32) * 0.008   # below prob
    th[40:90, 5] = 0.5
    th[10:20, 17] = 0.9
    th[100:120, 31] = 0.05
    prob = 0.01
    s0, s1 = 4, 120

    # meshless reference
    packed, _ = seg.extract_packed(jnp_asarray(th), s0, s1, prob, cap)
    st_w, b_w, score_w, nk_w, nneed_w = seg.unpack_extract_rows(
        np.asarray(jax.device_get(packed)), cap)
    assert nneed_w <= cap

    # per-shard rows, merged
    rows = []
    Pl = P // S
    for s in range(S):
        pk, _ = seg.extract_packed(jnp_asarray(th[:, s * Pl:(s + 1) * Pl]),
                                   s0, s1, prob, cap)
        rows.append(np.asarray(jax.device_get(pk)))
    st_m, b_m, score_m, ns_kept, ns_need = seg.merge_packed_shards(
        np.stack(rows), T, Pl)
    assert sum(ns_kept) == nk_w
    assert max(ns_need) <= cap
    np.testing.assert_array_equal(st_m, st_w[:nk_w])
    np.testing.assert_array_equal(b_m, b_w[:nk_w])
    np.testing.assert_allclose(score_m, score_w[:nk_w], rtol=1e-6)


def test_packed_extraction_is_kept_compacted():
    """The packed row must hold exactly the KEPT (lv != 4) runs of the
    raw boundary stream, in order, with the run ends computed against
    the FULL stream — i.e. device-side compaction is equivalent to the
    host-side `lv != 4` filter over `extract_runs_jax` output."""
    import jax
    from fastsmc_tpu.engine import segments as seg

    rng = np.random.default_rng(7)
    T, P = 256, 24
    cap = 4096
    prob = 0.001
    sums = (rng.random((T, P)) *
            rng.choice([1e-6, 1e-2, 1e-1, 0.5, 1.0], size=(T, P))
            ).astype(np.float32)
    s0, s1 = 9, 230

    idx, lv, n, score, pair, a, b = jax.jit(
        seg.extract_runs_jax, static_argnums=(4,))(sums, s0, s1, prob, cap)
    nb = int(n)
    keep = np.asarray(lv)[:nb] != 4
    want_start = np.asarray(idx)[:nb][keep]
    want_b = np.asarray(b)[:nb][keep]
    want_score = np.asarray(score)[:nb][keep]

    packed, _ = seg.extract_packed(jnp_asarray(sums), s0, s1, prob, cap)
    st, bb, sc, nk, nr = seg.unpack_extract_rows(
        np.asarray(jax.device_get(packed)), cap)
    assert nk == keep.sum()
    assert nr == nb
    np.testing.assert_array_equal(st[:nk], want_start)
    np.testing.assert_array_equal(bb[:nk], want_b)
    np.testing.assert_allclose(sc[:nk], want_score, rtol=1e-6)
    pr, aa, bb2, sc2 = seg.runs_from_packed(st[:nk], bb[:nk], sc[:nk], T)
    np.testing.assert_array_equal(pr, want_start // T)
    np.testing.assert_array_equal(aa, want_start % T)

    # independent (smaller) kept cap: same kept stream, shorter row
    kcap = 3072
    assert nk <= kcap < cap
    packed2, _ = seg.extract_packed(jnp_asarray(sums), s0, s1, prob, cap,
                                    kcap=kcap)
    row2 = np.asarray(jax.device_get(packed2))
    assert len(row2) == 3 * kcap + 2
    st2, bb2_, sc2_, nk2, nr2 = seg.unpack_extract_rows(row2, kcap)
    assert (nk2, nr2) == (nk, nr)
    np.testing.assert_array_equal(st2[:nk], want_start)
    np.testing.assert_array_equal(bb2_[:nk], want_b)
    np.testing.assert_allclose(sc2_[:nk], want_score, rtol=1e-6)


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def test_extract_runs_jax_matches_host():
    """The fully in-jit extraction (extract_runs_jax + segments_from_runs,
    used by the fused decode+extract path) must reproduce the host path:
    same runs, same scores, same window masking."""
    import jax

    rng = np.random.default_rng(11)
    T, P = 256, 16
    prob = 0.001
    ex = jax.jit(seg.extract_runs_jax, static_argnums=(4,))
    for trial, (s0, s1) in enumerate([(0, 256), (17, 201), (100, 101)]):
        sums = (rng.random((T, P)) *
                rng.choice([1e-6, 1e-2, 1e-1, 0.5, 1.0], size=(T, P))
                ).astype(np.float32)
        want = seg.extract_segments(sums[s0:s1], prob, 5 + s0, None, 0)
        idx, lv, n, score, pair, a, b = ex(sums, s0, s1, prob, 4096)
        nb = int(n)
        assert nb <= 4096
        got = seg.segments_from_runs(np.asarray(idx), np.asarray(lv),
                                     np.asarray(score), nb, T, s1, 5)
        assert len(got) == len(want), f"window {trial}"
        for g, w in zip(got, want):
            assert (g.pair, g.start, g.end) == (w.pair, w.start, w.end)
            np.testing.assert_allclose(g.score_sum, w.score_sum, rtol=1e-5)
        # device-side run bounds agree with the host recomputation
        pair_h, a_h, b_h = (np.asarray(x)[:nb] for x in (pair, a, b))
        keep = np.asarray(lv)[:nb] != 4
        assert [(int(p), int(x) + 5, int(y) + 5) for p, x, y in
                zip(pair_h[keep], a_h[keep], b_h[keep])] == \
            [(g.pair, g.start, g.end) for g in got]


def test_run_pps_jax_matches_host():
    """In-jit per-run posterior-state sums (fused path) vs the host path."""
    import jax

    rng = np.random.default_rng(13)
    T, K, P = 128, 8, 8
    prob = 0.002
    post = rng.random((T, K, P)).astype(np.float32)
    post /= post.sum(axis=1, keepdims=True)
    scale = rng.choice([1e-6, 1e-2, 0.5, 1.0], size=(T, P))
    sums = (post[:, :4].sum(axis=1) * scale).astype(np.float32)
    want = seg.extract_segments(sums, prob, 0, post, K)

    idx, lv, n, score, pair, a, b = jax.jit(
        seg.extract_runs_jax, static_argnums=(4,))(sums, 0, T, prob, 1024)
    pps = jax.jit(seg.run_pps_jax, static_argnums=(4,))(post, pair, a, b,
                                                        1024)
    nb = int(n)
    got = seg.segments_from_runs(np.asarray(idx), np.asarray(lv),
                                 np.asarray(score), nb, T, T, 0,
                                 pps=np.asarray(pps), age_threshold=K)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g.pair, g.start, g.end) == (w.pair, w.start, w.end)
        np.testing.assert_allclose(g.pps, w.pps, rtol=1e-4)


def test_run_ages_jax_matches_scalar_helpers():
    """Device-computed per-run ages (run_ages_jax) vs the scalar
    reference helpers (HMM.cpp:1087-1107). Means match to f32 rounding
    (the device divides in f32; the host helper divides in f64 then
    rounds — <=1 ulp apart); MAPs are exact except at argmax ties within
    rounding."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fastsmc_tpu.engine import segments as seg

    rng = np.random.default_rng(3)
    K, ath, n = 69, 50, 300
    pps = (rng.random((n, K)).astype(np.float32)
           * rng.random(n)[:, None].astype(np.float32) * 100)
    et = (rng.random(K).astype(np.float32) * 5000)
    isp = (rng.random(K).astype(np.float32) + 0.01)
    got = np.asarray(seg.run_ages_jax(pps, et, isp, ath))
    assert got.shape == (2, n)
    want_pm = np.array([seg.posterior_mean_from_pps(p[:ath], et)
                        for p in pps], np.float32)
    want_mp = np.array([seg.map_from_pps(p[:ath], isp, et)
                        for p in pps], np.float32)
    np.testing.assert_allclose(got[0], want_pm, rtol=2e-6)
    np.testing.assert_array_equal(got[1], want_mp)
