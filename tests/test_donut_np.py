"""Numpy Donut-VAE: gradient check + training/quality behavior."""

import numpy as np
import pytest

from loudml_spark.ml.donut_np import NumpyVAE


def test_gradient_check():
    """Hand-derived backprop vs central finite differences."""
    vae = NumpyVAE(span=4, latent=2, hidden=5, seed=0)
    rng = np.random.default_rng(1)
    X = rng.normal(size=(3, 4))
    M = (rng.random((3, 4)) > 0.2).astype(float)
    eps = rng.standard_normal((3, 2))

    _, grads = vae.loss_and_grads(X, M, eps)
    h = 1e-6
    for name, p in vae.params.items():
        num = np.zeros_like(p)
        it = np.nditer(p, flags=["multi_index"])
        for _ in it:
            idx = it.multi_index
            orig = p[idx]
            p[idx] = orig + h
            lp, _ = vae.loss_and_grads(X, M, eps)
            p[idx] = orig - h
            lm, _ = vae.loss_and_grads(X, M, eps)
            p[idx] = orig
            num[idx] = (lp - lm) / (2 * h)
        err = np.max(np.abs(num - grads[name]))
        scale = np.maximum(1e-3, np.max(np.abs(num)))
        assert err / scale < 1e-4, (name, err, scale)


def test_training_reduces_loss_and_is_deterministic():
    rng = np.random.default_rng(2)
    t = np.arange(400)
    series = np.sin(2 * np.pi * t / 24) + 0.05 * rng.standard_normal(400)
    W = 24
    X = np.lib.stride_tricks.sliding_window_view(series, W).copy()
    M = np.ones_like(X)

    v1 = NumpyVAE(span=W, latent=3, hidden=21, seed=42)
    hist1 = v1.fit(X, M, epochs=30, batch_size=64)
    assert hist1[-1] < hist1[0]

    v2 = NumpyVAE(span=W, latent=3, hidden=21, seed=42)
    hist2 = v2.fit(X, M, epochs=30, batch_size=64)
    assert hist1 == hist2  # RANDOM_SEED contract
    assert np.array_equal(v1.params["We"], v2.params["We"])


def test_reconstruction_tracks_signal():
    rng = np.random.default_rng(3)
    t = np.arange(600)
    series = np.sin(2 * np.pi * t / 24) + 0.05 * rng.standard_normal(600)
    W = 24
    X = np.lib.stride_tricks.sliding_window_view(series, W).copy()
    M = np.ones_like(X)
    vae = NumpyVAE(span=W, latent=3, hidden=34, seed=42)
    vae.fit(X, M, epochs=80, batch_size=64)

    # last point masked as missing (donut.py:1260-1265)
    Mq = M.copy()
    Mq[:, -1] = 0.0
    mu, sigma = vae.reconstruct(X, Mq, np.random.default_rng(9))
    err = np.abs(mu[:, -1] - X[:, -1])
    # predict-vs-observe gate ≤ 2.0 (BASELINE.md; amplitude here is 1.0,
    # so demand much tighter than the reference's gate)
    assert np.mean(err) < 0.4
    assert np.quantile(err, 0.95) < 1.0
    assert np.all(sigma[:, -1] > 0)


def test_state_roundtrip():
    vae = NumpyVAE(span=8, latent=2, hidden=8, seed=5)
    state = vae.state_dict()
    back = NumpyVAE.from_state(state)
    X = np.random.default_rng(0).normal(size=(4, 8))
    M = np.ones_like(X)
    r = np.random.default_rng(1)
    r2 = np.random.default_rng(1)
    mu1, s1 = vae.reconstruct(X, M, r)
    mu2, s2 = back.reconstruct(X, M, r2)
    assert np.array_equal(mu1, mu2) and np.array_equal(s1, s2)


def test_mc_count_100_vs_1000_band_parity():
    """Pin the MC_COUNT deviation (reference donut.py:89 uses 1000 MC
    integration samples; we default to 100).  Measured on the trained
    sine model, same rng seed: mean band width ratio 0.9996, per-
    window sigma relative diff mean 0.7% / p95 1.9% / max 3.6%,
    reconstruction mean abs diff 0.002 on an amplitude-1.0 signal,
    identical 3σ anomaly decisions (1/577 flips at 2σ), 14× faster.
    This test re-derives those numbers and gates them so a regression
    in the integrator (or a silent MC_COUNT change) surfaces."""
    rng = np.random.default_rng(3)
    t = np.arange(600)
    series = np.sin(2 * np.pi * t / 24) + 0.05 * rng.standard_normal(600)
    W = 24
    X = np.lib.stride_tricks.sliding_window_view(series, W).copy()
    M = np.ones_like(X)
    vae = NumpyVAE(span=W, latent=3, hidden=34, seed=42)
    vae.fit(X, M, epochs=80, batch_size=64)
    Mq = M.copy()
    Mq[:, -1] = 0.0

    mu1, s1 = vae.reconstruct(X, Mq, np.random.default_rng(9), mc=100)
    mu2, s2 = vae.reconstruct(X, Mq, np.random.default_rng(9), mc=1000)
    b1, b2 = s1[:, -1], s2[:, -1]
    m1, m2 = mu1[:, -1], mu2[:, -1]
    # aggregate band width within 2% of the mc=1000 integration
    assert abs(b1.mean() / b2.mean() - 1.0) < 0.02
    # per-window sigma: p95 of the relative diff under 5%
    assert np.quantile(np.abs(b1 - b2) / b2, 0.95) < 0.05
    # reconstruction means agree to 2% of the signal amplitude
    assert np.abs(m1 - m2).max() < 0.02
    # anomaly DECISIONS at the detect thresholds are unchanged at 3σ
    z1 = np.abs(X[:, -1] - m1) / b1
    z2 = np.abs(X[:, -1] - m2) / b2
    assert np.array_equal(z1 > 3.0, z2 > 3.0)
    # ≤ 1% of windows may flip at the twitchier 2σ threshold
    assert np.mean((z1 > 2.0) != (z2 > 2.0)) <= 0.01
