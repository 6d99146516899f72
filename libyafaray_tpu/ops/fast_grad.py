"""Gathers from small f32 tables with a matmul BACKWARD pass.

The VJP XLA derives for a gather is a scatter-add; on TPU each
[N] -> [rows, C] scatter-add measured ~2.3 ms at N=262k regardless of
`rows` (round-4 caustic profile: 231 of them = 510 ms of a 777 ms
fwd+bwd step). For SMALL tables the same reduction expressed as
grad[t, c] = sum_n (idx == t) * g[n, c] is a chunked one-hot
dot_general on the MXU and costs a fraction of that, with bit-identical
results (pure sums, f32 accumulation).

Used for texel pools (textures/image.py) and material-table columns
(materials/bsdf.py) — anywhere gradients flow to per-entity parameters
through per-lane id gathers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

# tables up to this many rows get the matmul backward; larger ones keep
# the standard gather/scatter (the one-hot cost scales with N * rows)
MATMUL_GRAD_ROWS = 4096
_GRAD_CHUNK = 16384


@functools.lru_cache(maxsize=None)
def _take_for(rows: int):
    """`rows` is baked per cached instance because custom_vjp residuals
    must be JAX types (a dtype/shape tuple is not)."""

    @jax.custom_vjp
    def take_(arr, flat_idx):
        return arr[flat_idx]

    def fwd(arr, flat_idx):
        return arr[flat_idx], flat_idx

    def bwd(flat_idx, g):
        n = flat_idx.shape[0]
        npad = -(-n // _GRAD_CHUNK) * _GRAD_CHUNK
        if npad != n:
            # padding lanes index row `rows`: outside arange -> no hit
            flat_idx = jnp.concatenate(
                [flat_idx, jnp.full((npad - n,), rows, flat_idx.dtype)])
            g = jnp.concatenate(
                [g, jnp.zeros((npad - n,) + g.shape[1:], g.dtype)])
        idx = flat_idx.reshape(-1, _GRAD_CHUNK)
        gp = g.reshape(idx.shape[0], _GRAD_CHUNK, *g.shape[1:])

        def chunk(acc, args):
            ic, gc = args
            onehot = (ic[:, None] == jnp.arange(rows)[None, :]
                      ).astype(jnp.float32)
            return acc + jax.lax.dot_general(
                onehot, gc.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), None

        zero = jnp.zeros((rows,) + g.shape[1:], jnp.float32)
        grad, _ = jax.lax.scan(chunk, zero, (idx, gp))
        return grad, None

    take_.defvjp(fwd, bwd)
    return take_


def take(arr: Array, idx: Array) -> Array:
    """arr[idx] with the fast-gradient backward when eligible (f32 table,
    <= MATMUL_GRAD_ROWS rows, 1-D index); plain gather otherwise."""
    if (arr.dtype == jnp.float32 and idx.ndim == 1
            and arr.shape[0] <= MATMUL_GRAD_ROWS):
        return _take_for(arr.shape[0])(arr, idx)
    return arr[idx]
