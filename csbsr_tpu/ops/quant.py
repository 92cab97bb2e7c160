"""int8 post-training quantization helpers for the serving path.

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197 TOPS
peak; measured on-chip: conv3x3 224^2 128ch 274 vs 154 TF/s-equiv = 1.78x,
PERF.md round 3). The serving-mode quantized conv uses:

  - per-output-channel symmetric weight scales (max|W| / 127), computed at
    trace time from the f32 params - no separate quantized checkpoint;
  - per-tensor symmetric activation scales: STATIC when a calibrated
    abs-max is available (the elementwise quantize then fuses into the
    producer's dequant epilogue - measured to be the difference between
    1.78x and 1.1x on 3x3 chains), DYNAMIC (on-the-fly abs-max) otherwise.

Calibration is flax-native: quantized blocks own a `quant` collection
variable `act_amax`; running the bf16 model with `mutable=["quant"]` over
calibration batches records running abs-maxima, and serving with the
returned collection in `variables` switches the blocks to static scales
(`csbsr_tpu/models/blocks.py:_Int8Conv/_Int8Deconv`).

This is an OPT-IN serving mode (CSBSR_INT8_SERVE=1): CSBSR is a joint
regression+segmentation model and the released-weight accuracy window
(0.5%) has to be re-validated per checkpoint before using it in production.
`tools/int8_accuracy.py` measures bf16-vs-int8 output agreement for a
given checkpoint.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def quantize_weight(kernel: jnp.ndarray, out_axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantization of a conv kernel.

    Returns (int8 kernel, f32 scale per output channel). Weights are
    trace-time values, so XLA constant-folds this whole function.
    """
    reduce_axes = tuple(a for a in range(kernel.ndim) if a != out_axis)
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=reduce_axes)
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    shape = [1] * kernel.ndim
    shape[out_axis] = -1
    q = jnp.clip(jnp.round(kernel.astype(jnp.float32) / scale.reshape(shape)), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_act(x: jnp.ndarray, amax: Optional[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric int8 quantization of an activation.

    `amax` is the calibrated abs-max (static path); None computes it on the
    fly (dynamic path - costs one full reduction over the tensor).
    """
    if amax is None:
        amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    # quantize math in the input dtype (bf16 holds integers <= 256 exactly);
    # the round/clip/cast chain fuses into the producer's epilogue
    q = jnp.clip(jnp.round(x / scale.astype(x.dtype)), -127, 127).astype(jnp.int8)
    return q, scale


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    strides: Sequence[int],
    padding,
    dilation: Sequence[int] = (1, 1),
    groups: int = 1,
    act_amax: Optional[jnp.ndarray] = None,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """int8 x int8 -> int32 conv with f32 dequant; NHWC/HWIO/NHWC."""
    xq, xs = quantize_act(x, act_amax)
    wq, ws = quantize_weight(kernel, out_axis=3)
    y = lax.conv_general_dilated(
        xq, wq, tuple(strides), padding,
        rhs_dilation=tuple(dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (xs * ws)).astype(out_dtype)


def int8_conv_transpose(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    strides: Sequence[int],
    padding,
    act_amax: Optional[jnp.ndarray] = None,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """int8 transposed conv (kernel layout (k, k, O, I), torch-parity)."""
    xq, xs = quantize_act(x, act_amax)
    wq, ws = quantize_weight(kernel, out_axis=2)
    y = lax.conv_transpose(
        xq, wq, tuple(strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (xs * ws)).astype(out_dtype)
