import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae3d_tpu.metrics.baur import baur_loss_3d
from vqvae3d_tpu.metrics.distribution import (
    logistic_log_prob,
    logistic_sample,
    mixture_nll_loss,
    sample_mixture,
)
from vqvae3d_tpu.metrics.evaluate import nmse, psnr, ssim2d, ssim3d_slices

KEY = jax.random.PRNGKey(0)


def test_nmse_psnr_basics():
    x = jax.random.normal(KEY, (2, 8, 8, 4, 1))
    y = x + 0.1
    assert float(nmse(x, x)) == 0.0
    got = float(nmse(x, y))
    want = np.sum((np.asarray(y) - np.asarray(x)) ** 2) / np.sum(np.asarray(x) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    got_psnr = float(psnr(x, y, data_range=4.0))
    want_psnr = 10 * np.log10(16.0 / np.mean((np.asarray(y) - np.asarray(x)) ** 2))
    np.testing.assert_allclose(got_psnr, want_psnr, rtol=1e-5)


def test_ssim_identity_and_monotonic():
    img = jax.random.uniform(KEY, (3, 32, 32, 1))
    assert float(ssim2d(img, img, data_range=1.0)) == pytest.approx(1.0, abs=1e-5)
    noisy_small = img + 0.05 * jax.random.normal(KEY, img.shape)
    noisy_big = img + 0.3 * jax.random.normal(KEY, img.shape)
    s_small = float(ssim2d(noisy_small, img, data_range=1.0))
    s_big = float(ssim2d(noisy_big, img, data_range=1.0))
    assert 0 < s_big < s_small < 1


def test_ssim_matches_reference_formula():
    """Cross-check against a naive per-window numpy SSIM on one image."""
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(1, 24, 24, 1)).astype(np.float32)
    b = (a + rng.normal(scale=0.1, size=a.shape)).astype(np.float32)

    def naive_ssim(x, y, data_range=1.0, size=11, sigma=1.5):
        from scipy.ndimage import correlate

        g1 = np.exp(-((np.arange(size) - (size - 1) / 2) ** 2) / (2 * sigma**2))
        g1 /= g1.sum()
        g = np.outer(g1, g1)
        x, y = x[0, ..., 0].astype(np.float64), y[0, ..., 0].astype(np.float64)

        def filt(i):
            return correlate(i, g, mode="constant")[5:-5, 5:-5]

        mx, my = filt(x), filt(y)
        mxx, myy, mxy = filt(x * x), filt(y * y), filt(x * y)
        vx, vy, cxy = mxx - mx**2, myy - my**2, mxy - mx * my
        c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
        s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
            (mx**2 + my**2 + c1) * (vx + vy + c2)
        )
        return s.mean()

    got = float(ssim2d(jnp.asarray(b), jnp.asarray(a), data_range=1.0))
    want = naive_ssim(b, a)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ssim3d_slices_shape():
    x = jax.random.uniform(KEY, (2, 24, 24, 6, 1))
    s = ssim3d_slices(x, x, data_range=1.0)
    assert float(s) == pytest.approx(1.0, abs=1e-5)


def test_logistic_log_prob_vs_torch():
    import torch
    import torch.distributions as dist

    loc, scale = 0.3, 1.7
    xs = np.linspace(-5, 5, 11).astype(np.float32)
    base = dist.Uniform(torch.zeros(1), torch.ones(1))
    torch_logistic = dist.TransformedDistribution(
        base,
        [dist.SigmoidTransform().inv, dist.AffineTransform(loc=loc, scale=scale)],
    )
    want = torch_logistic.log_prob(torch.tensor(xs)[:, None])[:, 0].numpy()
    got = np.asarray(logistic_log_prob(jnp.asarray(xs), loc, scale))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mixture_nll_and_sampling():
    n_mix = 3
    k1, k2, k3, k4 = jax.random.split(KEY, 4)
    x = jax.random.normal(k1, (4, 5))
    logits = jax.random.normal(k2, (4, 5, n_mix))
    loc = jax.random.normal(k3, (4, 5, n_mix))
    scale = jnp.exp(jax.random.normal(k4, (4, 5, n_mix)) * 0.2)

    nll = mixture_nll_loss(x, logits, loc, scale, reduce_sum=False)
    assert nll.shape == x.shape

    # manual logsumexp check at one element
    lp = np.asarray(jax.nn.log_softmax(logits, -1))[0, 0]
    comp = np.asarray(logistic_log_prob(x[0, 0], loc[0, 0], scale[0, 0]))
    want = -np.log(np.sum(np.exp(lp + comp)))
    np.testing.assert_allclose(float(nll[0, 0]), want, rtol=1e-5)

    s = sample_mixture(KEY, logits, loc, scale, greedy=True)
    assert s.shape == x.shape
    s2 = sample_mixture(KEY, logits, loc, scale, greedy=False)
    assert s2.shape == x.shape


def test_logistic_sample_moments():
    loc, scale = 2.0, 0.5
    s = logistic_sample(KEY, jnp.full((50000,), loc), jnp.full((50000,), scale))
    assert float(jnp.mean(s)) == pytest.approx(loc, abs=0.05)
    # logistic variance = (pi*scale)^2/3
    assert float(jnp.var(s)) == pytest.approx((np.pi * scale) ** 2 / 3, rel=0.05)


def test_baur_loss():
    x = jax.random.normal(KEY, (2, 8, 8, 4, 1))
    y = x + 0.1
    loss = baur_loss_3d(y, x, [jnp.array(0.5)])
    b = 2
    xf = np.asarray(x).reshape(b, -1)
    yf = np.asarray(y).reshape(b, -1)
    l1 = np.abs(xf - yf) + 1e-6
    want = l1.sum() + np.sqrt((l1**2).sum(1)).sum() + 0.5
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
