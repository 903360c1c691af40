"""Tabular transformations: augmentation / normalization / dropout.

Parity: /root/reference/transformers4rec/torch/tabular/transformations.py
(StochasticSwapNoise :30-93, TabularLayerNorm :97-142, TabularDropout :146-160).

TPU-first notes: StochasticSwapNoise is redesigned to be jit-compatible — the
reference's ``masked_select`` + dynamic-count permutation is replaced by a
fixed-shape "sample a random non-pad element" gather (with replacement instead
of the reference's without-replacement permutation; statistically equivalent for
an augmentation). RNG is threaded via linen's ``make_rng('augment')`` /
``make_rng('dropout')``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import TabularData, TabularTransformation, tabular_transformation_registry


@tabular_transformation_registry.register("stochastic-swap-noise", "ssn")
class StochasticSwapNoise(TabularTransformation):
    """Replace each feature value with a random other (non-pad) value of the same
    feature with probability ``replacement_prob`` — training-time only."""

    pad_token: int = 0
    replacement_prob: float = 0.1

    @nn.compact
    def __call__(self, inputs: TabularData, training: bool = False,
                 pad_mask: Optional[jnp.ndarray] = None) -> TabularData:
        if not training:
            return inputs
        rng = self.make_rng("augment")
        out: TabularData = {}
        for key, val in inputs.items():
            # reserved NON-feature batch keys must pass through untouched:
            # segment_ids is session-packing structure (swap-noising it
            # would corrupt the block-diagonal attention), and dunder keys
            # (__neg_ids__) are trainer-side side channels
            if key == "segment_ids" or key.startswith("__"):
                out[key] = val
                continue
            rng, k1, k2, k3 = jax.random.split(rng, 4)
            # per-feature validity: the shared pad_mask when its shape
            # matches this feature's leading dims; otherwise derive from
            # pad_token like the reference (a (B, D) context feature must
            # NOT be broadcast against a (B, S) session mask, and with no
            # mask at all pad positions must never be swap sources/targets)
            if pad_mask is not None and val.shape[: pad_mask.ndim] == pad_mask.shape:
                mask = pad_mask
            elif val.ndim == 3:
                mask = (val != self.pad_token).any(axis=-1)
            else:
                mask = val != self.pad_token
            flat = val.reshape(-1, val.shape[-1]) if val.ndim == 3 else val.reshape(-1)
            n = flat.shape[0]
            mflat = mask.reshape(-1)
            # sample a random source among non-pad elements via Gumbel-max over the mask
            gumbel = jax.random.gumbel(k1, (n,))
            # one shared random ranking; per-target offsets decorrelate picks
            scores = jnp.where(mflat, gumbel, -jnp.inf)
            order = jnp.argsort(-scores)  # non-pad elements in random order first
            num_valid = jnp.maximum(mflat.sum(), 1)
            pick = jax.random.randint(k2, (n,), 0, n) % num_valid
            src = order[pick]
            replaced = flat[src].reshape(val.shape)
            swap = jax.random.bernoulli(k3, self.replacement_prob, mask.shape)
            swap = swap & mask
            if val.ndim == mask.ndim + 1:
                swap = swap[..., None]
            out[key] = jnp.where(swap, replaced, val)
        return out


@tabular_transformation_registry.register("layer-norm")
class TabularLayerNorm(TabularTransformation):
    """Per-feature LayerNorm over the embedding dim (skips 2-D scalar features)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, inputs: TabularData, training: bool = False,
                 pad_mask: Optional[jnp.ndarray] = None) -> TabularData:
        out = {}
        for key, val in inputs.items():
            if val.ndim >= 2 and val.shape[-1] > 1 and jnp.issubdtype(val.dtype, jnp.floating):
                out[key] = nn.LayerNorm(epsilon=self.eps, name=f"ln_{key}")(val)
            else:
                out[key] = val
        return out


@tabular_transformation_registry.register("dropout")
class TabularDropout(TabularTransformation):
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, inputs: TabularData, training: bool = False,
                 pad_mask: Optional[jnp.ndarray] = None) -> TabularData:
        drop = nn.Dropout(rate=self.dropout_rate, deterministic=not training)
        return {k: (drop(v) if jnp.issubdtype(v.dtype, jnp.floating) else v)
                for k, v in inputs.items()}
