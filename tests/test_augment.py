"""On-device augmentation: ranges, determinism, flip/mask pairing, hue."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_learning_tpu.data.augment import (_adjust_hue,
                                                  _hue_rotation_matrices,
                                                  augment_view,
                                                  augment_views,
                                                  augment_views_with_mask,
                                                  color_jitter_batch,
                                                  normalize_batch,
                                                  random_flips)


def test_augment_view_range_and_determinism(rng):
    imgs = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(0)
    out1 = augment_view(key, jnp.asarray(imgs))
    out2 = augment_view(key, jnp.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert float(jnp.min(out1)) >= -1.0 and float(jnp.max(out1)) <= 1.0
    out3 = augment_view(jax.random.PRNGKey(1), jnp.asarray(imgs))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_color_jitter_identity_factors(rng):
    """With zero jitter amplitudes the op chain is (near-)identity — the
    YIQ round-trip matrices carry ~1e-3 coefficient rounding."""
    x = jnp.asarray(rng.uniform(0.1, 0.9, (2, 16, 16, 3)).astype(np.float32))
    y = color_jitter_batch(jax.random.PRNGKey(0), x, brightness=0.0,
                           contrast=0.0, saturation=0.0, hue=0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=3e-3)


def test_yiq_hue_close_to_hsv_for_small_shifts(rng):
    """YIQ rotation is a linear stand-in for PIL's HSV hue shift: same
    direction and comparable magnitude (mean deviation ~1% at the
    0.01-turn amplitude); distributionally equivalent for the symmetric
    jitter the reference uses."""
    x = jnp.asarray(rng.uniform(0.05, 0.95, (1, 32, 32, 3))
                    .astype(np.float32))
    hsv = _adjust_hue(x[0], 0.01)
    m = _hue_rotation_matrices(jnp.asarray([0.01 * 2 * np.pi]))
    yiq = jnp.clip(jnp.einsum("bij,bhwj->bhwi", m, x), 0, 1)[0]
    mean_dev = float(jnp.mean(jnp.abs(hsv - yiq)))
    assert mean_dev < 0.02
    # same direction: YIQ(+t) closer to HSV(+t) than to HSV(-t)
    hsv_neg = _adjust_hue(x[0], -0.01)
    assert mean_dev < float(jnp.mean(jnp.abs(hsv_neg - yiq)))


def test_flips_are_per_sample(rng):
    imgs = jnp.asarray(rng.uniform(size=(16, 8, 8, 3)).astype(np.float32))
    out = random_flips(jax.random.PRNGKey(0), imgs)
    flipped_h = [not np.allclose(np.asarray(out[i]), np.asarray(imgs[i]))
                 for i in range(16)]
    assert any(flipped_h) and not all(flipped_h)


def test_mask_follows_view0_flips(rng):
    views = rng.integers(0, 255, (8, 4, 16, 16, 3), dtype=np.uint8)
    sp = np.tile(np.arange(16, dtype=np.int32)[None, :, None], (8, 1, 16))
    out, mask = augment_views_with_mask(jax.random.PRNGKey(3),
                                        jnp.asarray(views), jnp.asarray(sp),
                                        jitter=False)
    # reconstruct each sample's flip from the image and check the mask
    # transformed identically
    x0 = np.asarray(out[:, 0])
    ref = views[:, 0].astype(np.float32) / 255.0 * 2 - 1
    for b in range(8):
        for fh in (False, True):
            for fv in (False, True):
                img = ref[b]
                if fh:
                    img = img[:, ::-1]
                if fv:
                    img = img[::-1]
                if np.allclose(img, x0[b], atol=1e-5):
                    m = sp[b]
                    if fh:
                        m = m[:, ::-1]
                    if fv:
                        m = m[::-1]
                    np.testing.assert_array_equal(np.asarray(mask[b]), m)
                    break
            else:
                continue
            break
        else:
            raise AssertionError(f"no flip combination matched sample {b}")


def test_normalize_batch_range():
    x = np.array([[0, 127.5, 255]], dtype=np.uint8)
    out = np.asarray(normalize_batch(jnp.asarray(x)))
    np.testing.assert_allclose(out, [[-1.0, 0.0, 1.0]], atol=5e-3)


def test_jitter_distribution_matches_torchvision_semantics(rng):
    """Distribution-distance regression pinning the two documented
    deviations (fixed op order; YIQ hue) against a numpy transliteration
    of torchvision ColorJitter (random op order, HSV hue) on a fixed
    batch.  Bounds chosen ~3x above the observed deviation so a real
    regression (wrong factor range, broken op) trips, while the deliberate
    deviations stay within (VERDICT r2 #8 / PARITY deviations table)."""
    from matplotlib.colors import hsv_to_rgb, rgb_to_hsv

    B, H, W = 8, 24, 24
    x = rng.uniform(0.05, 0.95, (B, H, W, 3)).astype(np.float32)
    BR, CO, SA, HU = 0.1, 0.1, 0.05, 0.01

    def tv_jitter(img, r):
        def bright(y, f):
            return np.clip(y * f, 0, 1)

        def contrast(y, f):
            g = (0.2989 * y[..., 0] + 0.587 * y[..., 1]
                 + 0.114 * y[..., 2]).mean()
            return np.clip(y * f + (1 - f) * g, 0, 1)

        def sat(y, f):
            g = (0.2989 * y[..., 0] + 0.587 * y[..., 1]
                 + 0.114 * y[..., 2])[..., None]
            return np.clip(y * f + (1 - f) * g, 0, 1)

        def hue(y, f):
            hsv = rgb_to_hsv(np.clip(y, 0, 1))
            hsv[..., 0] = (hsv[..., 0] + f) % 1.0
            return hsv_to_rgb(hsv)

        fs = [
            (bright, r.uniform(1 - BR, 1 + BR)),
            (contrast, r.uniform(1 - CO, 1 + CO)),
            (sat, r.uniform(1 - SA, 1 + SA)),
            (hue, r.uniform(-HU, HU)),
        ]
        for i in r.permutation(4):
            img = fs[i][0](img, fs[i][1])
        return img

    K = 32
    ours, ref = [], []
    for t in range(K):
        y = np.asarray(color_jitter_batch(
            jax.random.PRNGKey(1000 + t), jnp.asarray(x),
            brightness=BR, contrast=CO, saturation=SA, hue=HU))
        r = np.random.default_rng(2000 + t)
        z = np.stack([tv_jitter(x[i].copy(), r) for i in range(B)])
        for acc, batch in ((ours, y), (ref, z)):
            acc.append(np.concatenate([batch.mean(axis=(0, 1, 2)),
                                       batch.std(axis=(0, 1, 2))]))
    ours, ref = np.stack(ours), np.stack(ref)

    # distribution means: the jitter is centred, so both pipelines must
    # agree on the expected channel statistics
    np.testing.assert_allclose(ours.mean(0), ref.mean(0), atol=0.01)
    # distribution spread: the trial-to-trial scatter of the channel means
    # measures the effective jitter strength; must match within 50%
    scatter_o, scatter_r = ours.std(0), ref.std(0)
    assert np.all(scatter_o < 1.5 * scatter_r + 1e-3)
    assert np.all(scatter_r < 1.5 * scatter_o + 1e-3)
