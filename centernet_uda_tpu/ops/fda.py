"""Fourier Domain Adaptation (FDA) low-frequency amplitude swap.

On-device JAX implementation of the reference FFT machinery
(``utils/image.py``: ``extract_ampl_phase`` :129-134, ``low_freq_mutate``
:137-157, ``FDA_source_to_target`` :189-230). The reference uses the legacy
``torch.rfft``/``irfft`` pair and builds the recomposed spectrum on the CPU
(utils/image.py:216-218); here the whole mix is ``jnp.fft`` under jit, so it
fuses into the training step and never leaves the device.

Layout: images are NHWC (B, H, W, C); the FFT runs over the spatial axes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _low_freq_mask(h: int, w: int, beta: float, use_circular: bool) -> jnp.ndarray:
    """Boolean (H, W) mask of the low-frequency region in *unshifted* FFT layout.

    The reference's rectangular variant swaps the four ``b x b`` corners of
    the unshifted spectrum, ``b = floor(min(h, w) * beta)``
    (utils/image.py:139,150-156). The circular variant rasterizes an ellipse
    of semi-axes ``(h*beta, w*beta)`` at the origin (utils/image.py:142-147);
    we evaluate the same ellipse analytically on the frequency grid, wrapped
    to the unshifted layout.
    """
    fy = jnp.minimum(jnp.arange(h), h - jnp.arange(h))[:, None].astype(jnp.float32)
    fx = jnp.minimum(jnp.arange(w), w - jnp.arange(w))[None, :].astype(jnp.float32)
    if use_circular:
        ay = max(int(h * beta), 1)
        ax = max(int(w * beta), 1)
        # cv2.ellipse(axes=(a, b)) rasterizes x^2/a^2 + y^2/b^2 <= 1 with the
        # first axis horizontal; the reference passes axes=(h*L, w*L).
        return (fx / ay) ** 2 + (fy / ax) ** 2 <= 1.0
    b = int(math.floor(min(h, w) * beta))
    return (fy < b) & (fx < b)


def fda_source_to_target(
    src: jax.Array, trg: jax.Array, beta: float = 0.1, use_circular: bool = False
) -> jax.Array:
    """Swap the low-frequency FFT amplitude of ``src`` with ``trg``'s.

    Returns source-content / target-style images, same shape and dtype as
    ``src`` (NHWC). Matches ``FDA_source_to_target`` (utils/image.py:189-230):
    amplitude from the 2D FFT, phase kept from the source, low-frequency
    amplitude replaced by the target's, inverse FFT, real part.
    """
    fft_axes = (1, 2)  # spatial axes of NHWC
    fft_src = jnp.fft.fft2(src.astype(jnp.float32), axes=fft_axes)
    fft_trg = jnp.fft.fft2(trg.astype(jnp.float32), axes=fft_axes)

    amp_src = jnp.abs(fft_src)
    pha_src = jnp.angle(fft_src)
    amp_trg = jnp.abs(fft_trg)

    mask = _low_freq_mask(src.shape[1], src.shape[2], beta, use_circular)
    amp_mixed = jnp.where(mask[None, :, :, None], amp_trg, amp_src)

    fft_mixed = amp_mixed * jnp.exp(1j * pha_src)
    out = jnp.real(jnp.fft.ifft2(fft_mixed, axes=fft_axes))
    return out.astype(src.dtype)
