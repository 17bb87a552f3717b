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


def _swap_mask(h: int, w: int, beta: float, use_circular: bool) -> jnp.ndarray:
    """Boolean (H, W) mask of spectrum cells that take the TARGET amplitude
    (unshifted FFT layout), replicating the reference's torch path exactly.

    - rectangular (utils/image.py:150-156): the four corner blocks — rows in
      ``[0:b] | [h-b:h]`` AND cols in ``[0:b] | [w-b:w]`` with
      ``b = floor(min(h, w) * beta)`` — take the target amplitude.
    - circular (utils/image.py:142-147): ``amp_src*mask + amp_trg*~mask``
      with a cv2 ellipse centered at the unshifted origin (only its
      positive-frequency quarter lies inside the image!) and axes
      ``(h*beta, w*beta)`` with the FIRST axis horizontal — i.e. the SOURCE
      amplitude is kept only inside that quarter-ellipse and everything
      else takes the target amplitude. (The reference's numpy twin does the
      opposite; the torch path is what the FDA trainer executes.)
    """
    iy = jnp.arange(h)[:, None].astype(jnp.float32)
    ix = jnp.arange(w)[None, :].astype(jnp.float32)
    if use_circular:
        ax_h = max(int(h * beta), 1)  # horizontal semi-axis (reference quirk)
        ax_v = max(int(w * beta), 1)
        keep_src = (ix / ax_h) ** 2 + (iy / ax_v) ** 2 <= 1.0
        return ~keep_src
    b = int(math.floor(min(h, w) * beta))
    row = (iy < b) | (iy >= h - b)
    col = (ix < b) | (ix >= w - b)
    return row & col


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

    mask = _swap_mask(src.shape[1], src.shape[2], beta, use_circular)
    amp_mixed = jnp.where(mask[None, :, :, None], amp_trg, amp_src)

    fft_mixed = amp_mixed * jnp.exp(1j * pha_src)
    out = jnp.real(jnp.fft.ifft2(fft_mixed, axes=fft_axes))
    return out.astype(src.dtype)
