"""Preprocessing transforms vs. the documented reference behavior."""

import numpy as np

from desmo_tpu import data


def test_drop_third_component():
    x = np.arange(9 * 4, dtype=float).reshape(9, 4)
    out = data.drop_third_component(x)
    assert out.shape == (6, 4)
    np.testing.assert_array_equal(out[0], x[0])
    np.testing.assert_array_equal(out[1], x[1])
    np.testing.assert_array_equal(out[2], x[3])  # row 2 (w) dropped
    np.testing.assert_array_equal(out[3], x[4])


def test_to_magnitude_2d_and_3d():
    rng = np.random.default_rng(0)
    for d in (2, 3):
        pts, m = 7, 5
        x = rng.standard_normal((pts * d, m))
        out = data.to_magnitude(x, d)
        assert out.shape == (pts, m)
        # check one entry by hand
        expect = np.sqrt(sum(x[0 * d + c, 2] ** 2 for c in range(d)))
        assert np.isclose(out[0, 2], expect)


def test_subtract_temporal_mean():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((10, 20))
    out, mean = data.subtract_temporal_mean(x)
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-12)
    np.testing.assert_allclose(mean, x.mean(axis=1))


def test_rearrange_for_transpose():
    """Loop-free equivalent of the reference's RearrangeDataForTranspose
    (DESMO_AE/...py:129-159): (2p, m) interleaved rows -> (p, 2m)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 5))  # 4 points x (u, v), 5 snapshots
    out = data.rearrange_for_transpose(x, 2)
    assert out.shape == (4, 10)
    # reference loop oracle
    u, v = x[0::2, :], x[1::2, :]
    expect = np.zeros((4, 10))
    for i in range(5):
        expect[:, 2 * i] = u[:, i]
        expect[:, 2 * i + 1] = v[:, i]
    np.testing.assert_array_equal(out, expect)


def test_subsample_and_scale():
    x = np.arange(4 * 10, dtype=float).reshape(4, 10)
    assert data.subsample_time(x, 2).shape == (4, 5)
    scaled = data.scale_inv_sqrt_m(x)
    np.testing.assert_allclose(scaled, x / np.sqrt(10))


def test_preprocess_pipeline_2d():
    rng = np.random.default_rng(2)
    pts, m = 8, 6
    x = rng.standard_normal((pts * 3, m))  # 3D input, w dropped for dim=2
    out, mean = data.preprocess(x, dim=2, magnitude=True, mean_subtract=True)
    assert out.shape == (pts, m)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-6)


def test_preprocess_inv_sqrt_m_leaves_mean_unscaled():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((9, 8)) + 5.0  # nonzero mean
    out, mean = data.preprocess(
        x, dim=3, magnitude=True, mean_subtract=True, inv_sqrt_m=True
    )
    mags = data.to_magnitude(x, 3)
    np.testing.assert_allclose(mean, mags.mean(axis=1), rtol=1e-6)
    expect = (mags - mags.mean(axis=1, keepdims=True)) / np.sqrt(8)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_streaming_preprocess_blocks_matches_preprocess():
    """Out-of-core L2: column-block streaming must concatenate to exactly the
    in-memory pipeline for every flag combination the presets use (magnitude /
    rearrange, mean, 1/sqrt(m), stride), at block widths that do and do not
    divide m — including re-iterability (the streaming POD pulls n_iter+2
    passes from the same callable)."""
    rng = np.random.default_rng(7)
    pts, m = 10, 17
    raw = rng.standard_normal((pts * 3, m)).astype(np.float32)
    cases = [
        dict(dim=2, magnitude=True, mean_subtract=True),  # cylinder
        dict(dim=3, magnitude=True, mean_subtract=True, inv_sqrt_m=True),  # aneurysm
        dict(dim=3, magnitude=True, mean_subtract=True, time_stride=2),  # channel
        dict(dim=2, magnitude=False, mean_subtract=True, time_stride=3),  # AE layout + stride
        dict(dim=3, magnitude=True, mean_subtract=False),
    ]
    for width in (3, 5, m):
        for kw in cases:
            def blocks(w=width):
                for t in range(0, m, w):
                    yield raw[:, t : t + w]

            out_fn, m_out, mean = data.streaming_preprocess_blocks(blocks, **kw)
            expect, mean_e = data.preprocess(raw, **kw)
            got = np.concatenate(list(out_fn()), axis=1)
            assert got.shape == expect.shape, (width, kw)
            assert m_out == expect.shape[1], (width, kw)
            np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
            if mean_e is None:
                assert mean is None
            else:
                np.testing.assert_allclose(mean, mean_e, rtol=1e-5)
            got2 = np.concatenate(list(out_fn()), axis=1)
            np.testing.assert_array_equal(got, got2)


def test_streaming_mean_accumulates_in_float64():
    """The temporal mean must not drift at the large m the out-of-core path
    exists for: sequential fp32 summation accrues O(m*eps) error vs
    preprocess's pairwise np.mean (round-4 review fix — the accumulator is
    f64). m=200k at a ~0.1 offset drifts ~1e-4 relative in fp32; require
    1e-7 of the exact f64 mean."""
    m = 200_000
    rng = np.random.default_rng(3)
    base = (0.1 + 0.01 * rng.standard_normal(m)).astype(np.float32)
    base = np.abs(base)
    # one spatial point, 3 components (u=base, v=w=0): magnitude == base
    raw = np.stack([base, np.zeros(m, np.float32), np.zeros(m, np.float32)])
    exact = np.mean(base.astype(np.float64))

    def blocks():
        for t in range(0, m, 4096):
            yield raw[:, t : t + 4096]

    _out, _m, mean = data.streaming_preprocess_blocks(
        blocks, dim=3, magnitude=True, mean_subtract=True
    )
    np.testing.assert_allclose(mean, exact, rtol=1e-7)
    # and the fp32 sequential sum would NOT have passed this bound
    drift = abs(np.cumsum(base.astype(np.float32), dtype=np.float32)[-1] / m - exact)
    assert drift > 1e-6 * abs(exact)
