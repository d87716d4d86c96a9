"""Pallas chain-fused WaveNet kernel.

The DDIM denoiser's WaveNet (4 stacks x 8 parallel chains at [64, 128, 512])
is a serial chain of ~5 small matmuls per block; XLA runs each matmul as its
own kernel, so every block costs ~5 HBM round trips of the 8 MB activation.
The chains never exchange data between stacks, so this kernel runs ONE
CHAIN END-TO-END — all `stacks` blocks for one dilation — with the
activation resident in VMEM: read x once, write the skip once, weights
(~9 MB) stay VMEM-resident across the batch grid.

Per-block math (reference latent_module.py:491-617, same as
models/wavenet.WavenetResBlock): res = 1x1(x); h = dilated causal conv(x);
h = h*gamma + beta (FiLM; conv bias folded into beta); h = tanh(h)*sigmoid(h)
+ res. The last stack projects through the skip conv.

Mosaic notes (this image's remote compiler): static indexing only inside the
kernel (dynamic VMEM row reads crash it), per-batch vectors tiled to
sublane-8 blocks, shifts as static slice+concatenate (roll lowers to an unsupported gather).

Opt-in via DIFFNORM_PALLAS_WAVENET=1 (models/wavenet.Wavenet.__call__).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain_kernel(x_ref, wconv_ref, wres_ref, wskip_ref, biases_ref,
                  film_ref, o_ref, *, dilation, k, stacks, t_len):
    x = x_ref[:]  # [T, C] in compute dtype (None dims dropped)
    c = x.shape[-1]
    for s in range(stacks):
        res = jnp.dot(x, wres_ref[s], preferred_element_type=jnp.float32)
        # NB: double-int indexing on a >=3-D ref lowers to an unsupported
        # gather; keep every vector read as a 2-D [1, N] slice
        res = res + biases_ref[s][0:1, :c].astype(jnp.float32)
        h = jnp.zeros((t_len, c), jnp.float32)
        for i in range(k):
            shift = (k - 1 - i) * dilation
            if shift >= t_len:
                continue  # the whole tap falls before the sequence
            if shift == 0:
                xi = x
            else:
                # static slice + concat (jnp.roll lowers to a gather Mosaic
                # rejects; pads also lower poorly)
                xi = jnp.concatenate(
                    [jnp.zeros((shift, c), x.dtype), x[:-shift]], axis=0
                )
            h = h + jnp.dot(xi, wconv_ref[s, i],
                            preferred_element_type=jnp.float32)
        gb = film_ref[s].astype(jnp.float32)  # [8, 2C]: gamma ++ beta'
        h = h * gb[0:1, :c] + gb[0:1, c:]
        h = jnp.tanh(h) * jax.nn.sigmoid(h) + res
        x = h.astype(o_ref.dtype)
    skip = jnp.dot(x, wskip_ref[...], preferred_element_type=jnp.float32)
    skip = skip + biases_ref[stacks - 1][0:1, c:].astype(jnp.float32)
    o_ref[:] = skip.astype(o_ref.dtype)


def wavenet_chain(x, w_conv, w_res, w_skip, biases, film8, dilation: int,
                  interpret: bool = False):
    """One WaveNet chain, all stacks fused, activation VMEM-resident.

    x:       [B, T, C] (compute dtype)
    w_conv:  [S, k, C, C]
    w_res:   [S, C, C]
    w_skip:  [C, C] (last stack's skip projection)
    biases:  [S, 8, 2C] — [..., :C] = res bias, [..., C:] = skip bias
             (zeros except the last stack); sublane-tiled
    film8:   [B, S, 8, 2C] — gamma ++ (beta + conv bias), per batch row
    Returns skip [B, T, C].
    """
    b, t, c = x.shape
    s, k = w_conv.shape[0], w_conv.shape[1]
    return pl.pallas_call(
        functools.partial(_chain_kernel, dilation=dilation, k=k, stacks=s,
                          t_len=t),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, k, c, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, c, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 8, 2 * c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s, 8, 2 * c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(x, w_conv, w_res, w_skip, biases, film8)
