"""Coverage for small utility surfaces: filters, color, logging, batch dict."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from uegan_tpu.data.pipeline import Batch
from uegan_tpu.ops.color import rgb_to_gray, rgb_to_ycbcr_y
from uegan_tpu.ops.filters import gaussian_noise
from uegan_tpu.utils.image_io import tensor2im
from uegan_tpu.utils.logging import Logger, ProgressMeter


def test_batch_attribute_access():
    b = Batch(img_raw=1, img_exp=2, img_name=["a"])
    assert b.img_raw == 1 and b["img_exp"] == 2
    b.extra = 3
    assert b["extra"] == 3


def test_gaussian_noise_statistics(rng):
    x = jnp.zeros((1, 64, 64, 3))
    y = gaussian_noise(jax.random.PRNGKey(0), x, mean=0.5, stddev=0.1)
    arr = np.asarray(y)
    assert abs(arr.mean() - 0.5) < 0.01
    assert abs(arr.std() - 0.1) < 0.01


def test_rgb_to_gray_matches_reference_coeffs(rng):
    x = rng.random((1, 4, 4, 3)).astype(np.float32)
    g = np.asarray(rgb_to_gray(jnp.asarray(x)))
    ref = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    np.testing.assert_allclose(g[..., 0], ref, rtol=1e-5)


def test_rgb_to_ycbcr_y_range(rng):
    x = rng.random((1, 4, 4, 3)).astype(np.float32)
    y = np.asarray(rgb_to_ycbcr_y(jnp.asarray(x)))
    assert y.min() >= 16 / 255 - 1e-6 and y.max() <= 235.1 / 255


def test_tensor2im():
    batch = np.asarray([[[[-1.0, 0.0, 1.0]]]])
    out = tensor2im(batch)
    assert out.dtype == np.uint8
    assert list(out[0, 0]) == [0, 127, 255]
    gray = np.full((1, 2, 2, 1), 0.0, np.float32)
    assert tensor2im(gray).shape == (2, 2, 3)


def test_logger_writes_event_file(tmp_path):
    lg = Logger(str(tmp_path))
    lg.scalar_summary("x/y", 1.5, 1)
    lg.images_summary("img", np.zeros((1, 4, 4, 3), np.float32), 1)
    lg.histo_summary("h", np.random.randn(100), 1)
    lg.flush()
    lg.close()
    assert any(f.startswith("events.out") for f in os.listdir(tmp_path))


def test_progress_meter_format():
    m = ProgressMeter()
    line = m.info_line(0, 10, {"D/Total": 1.2345})
    assert "Step:     1/10" in line and "D/Total:1.2345" in line


def test_distributed_noop_single_process():
    from uegan_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()  # returns silently without coordinator


def test_device_quantize_u8_bitwise_vs_host():
    """train/tester.py:_quantize_u8 == to_uint8(_denorm_np(.)) bit-for-bit:
    every op in the chain is IEEE-exact ((x+1)/2 divides by a power of two;
    *255 and rint round identically), so uint8 frames fetched from the
    device are byte-identical to the host denorm/round path."""
    import jax
    import numpy as np

    from uegan_tpu.train.tester import _denorm_np, _quantize_u8
    from uegan_tpu.utils.image_io import to_uint8

    rng = np.random.default_rng(0)
    # include exact half-integer-producing values and the clamp edges
    x = rng.uniform(-1.2, 1.2, (3, 17, 19, 3)).astype(np.float32)
    x[0, 0, 0] = [-1.0, 1.0, 0.0]
    host = to_uint8(_denorm_np(x))
    dev = np.asarray(jax.jit(_quantize_u8)(x))
    np.testing.assert_array_equal(dev, host)
    # bf16 network outputs take the same path
    import jax.numpy as jnp

    xb = jnp.asarray(x, jnp.bfloat16)
    host_b = to_uint8(_denorm_np(np.asarray(xb).astype(np.float32)))
    dev_b = np.asarray(jax.jit(_quantize_u8)(xb))
    np.testing.assert_array_equal(dev_b, host_b)
