"""Reformer capabilities: LSH attention (ops/lsh_attention.py) and axial
position embeddings — the reference's ReformerConfig surface
(/root/reference/transformers4rec/config/transformer.py:142-207: alternating
local/lsh attn_layers + axial positions on HF Reformer).

Pin strategy (the repo pattern): the sorted-chunk LSH path is validated
against the exact dense form of the SAME shared-QK semantics
(``lsh_reference``) in regimes where chunking is exhaustive; approximation
regimes are pinned by properties (causality, padding invisibility, hash
locality). Axial positions are pinned by EXACT weight transfer against HF
``AxialPositionEmbeddings`` (transformers is the library the reference
delegates to)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transformers4rec_tpu as tr
from transformers4rec_tpu.blocks.transformer import TransformerEncoder
from transformers4rec_tpu.ops.lsh_attention import (
    _hash_buckets,
    _normalize_keys,
    lsh_attention,
    lsh_reference,
)


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape), jnp.float32
    )


# --------------------------------------------------------------------------
# op level
# --------------------------------------------------------------------------

@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_pad", [False, True])
def test_sorted_path_equals_dense_when_chunk_covers_sequence(causal, with_pad):
    """One chunk + its (duplicated) predecessor covers every key → the
    sorted-chunk path must EXACTLY reproduce dense shared-QK attention,
    regardless of what the hashes decided."""
    B, S, H, D = 2, 16, 2, 8
    qk, v = _rand((B, S, H, D), 0), _rand((B, S, H, D), 1)
    pad = (
        jnp.asarray(np.random.default_rng(2).random((B, S)) > 0.25)
        if with_pad else None
    )
    ref = lsh_reference(qk, v, pad_mask=pad, causal=causal)
    got = lsh_attention(
        qk, v, pad_mask=pad, causal=causal, chunk_size=S,
        num_hashes=3, num_buckets=4, force_sorted=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_short_sequences_take_the_exact_dense_path():
    """Below LSH_MIN_SEQ the op IS the dense form (no approximation at
    session lengths — same dispatch philosophy as the flash kernel)."""
    qk, v = _rand((2, 12, 2, 8), 3), _rand((2, 12, 2, 8), 4)
    got = lsh_attention(qk, v, causal=True, chunk_size=4)
    ref = lsh_reference(qk, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


def test_multi_chunk_causality_and_padding_occlusion():
    """In the approximating regime (8 chunks): a future position's VALUE must
    never reach a causal query (its hash may still reshuffle the global
    bucket sort — an inherent property of LSH attention shared by HF
    Reformer, which is why the shipped Reformer config runs MLM); perturbing
    a PAD position must not change anything (pad buckets are forced, so not
    even the sort moves)."""
    B, S, H, D = 1, 64, 2, 8
    qk, v = _rand((B, S, H, D), 5), _rand((B, S, H, D), 6)
    pad = jnp.ones((B, S), bool).at[0, 50].set(False)
    kw = dict(pad_mask=pad, causal=True, chunk_size=8, num_hashes=2,
              num_buckets=8, force_sorted=True)
    base = lsh_attention(qk, v, **kw)
    # future VALUE perturbation at position 60 — queries < 60 unchanged
    v2 = v.at[0, 60].add(3.0)
    out2 = lsh_attention(qk, v2, **kw)
    np.testing.assert_allclose(
        np.asarray(out2[0, :60]), np.asarray(base[0, :60]), atol=1e-5
    )
    # pad perturbation — all valid outputs unchanged, pad output stays zero
    qk3 = qk.at[0, 50].add(7.0)
    v3 = v.at[0, 50].add(7.0)
    out3 = lsh_attention(qk3, v3, **kw)
    valid = np.asarray(pad[0])
    np.testing.assert_allclose(
        np.asarray(out3[0, valid]), np.asarray(base[0, valid]), atol=1e-5
    )
    assert np.abs(np.asarray(base[0, ~valid])).max() == 0.0


def test_identical_vectors_hash_to_identical_buckets():
    """The LSH property the whole op rests on: equal (direction) vectors get
    equal buckets in every round; a strongly negatively-correlated vector
    lands elsewhere in at least one round."""
    x = _rand((1, 64, 1, 8), 7)
    x = x.at[0, 60].set(x[0, 0])
    x = x.at[0, 61].set(-x[0, 0])
    b = _hash_buckets(_normalize_keys(x), num_buckets=8, num_hashes=4, seed=0)
    assert bool((b[0, 0, 0] == b[0, 60, 0]).all())
    assert bool((b[0, 0, 0] != b[0, 61, 0]).any())


def test_lsh_gradients_flow():
    def loss(qk, v):
        return lsh_attention(
            qk, v, causal=True, chunk_size=8, num_hashes=2, num_buckets=8,
            force_sorted=True,
        ).sum()

    qk, v = _rand((1, 64, 2, 8), 8), _rand((1, 64, 2, 8), 9)
    gq, gv = jax.grad(loss, argnums=(0, 1))(qk, v)
    assert np.isfinite(np.asarray(gq)).all() and np.isfinite(np.asarray(gv)).all()
    assert float(jnp.linalg.norm(gq)) > 0 and float(jnp.linalg.norm(gv)) > 0


def test_odd_num_buckets_rejected():
    qk = _rand((1, 8, 1, 4), 10)
    with pytest.raises(ValueError, match="even"):
        lsh_attention(qk, qk, num_buckets=7, force_sorted=True)


# --------------------------------------------------------------------------
# axial positions: exact HF weight transfer
# --------------------------------------------------------------------------

def test_axial_positions_match_hf_reformer_exactly():
    """Transfer HF AxialPositionEmbeddings weights into the encoder's two
    axial tables and pin the position term EXACTLY (same (d1, d2) row-major
    flattening: p → concat(w0[p // d2], w1[p % d2]))."""
    torch = pytest.importorskip("torch")
    from transformers import ReformerConfig as HFReformerConfig
    from transformers.models.reformer.modeling_reformer import (
        AxialPositionEmbeddings,
    )

    d1, d2, e1, e2, S = 4, 6, 16, 16, 22
    hf = AxialPositionEmbeddings(HFReformerConfig(
        axial_pos_shape=[d1, d2], axial_pos_embds_dim=[e1, e2],
        hidden_size=e1 + e2, max_position_embeddings=d1 * d2,
    ))
    hf.eval()
    with torch.no_grad():
        hf_term = hf(torch.arange(S)[None]).numpy()[0]  # (S, d)

    # n_layer=0 + post-LN (no final ln_f) + zero inputs → the encoder output
    # IS the position term, so this drives the SHIPPED lookup path, not a
    # test-side reimplementation of it
    enc = TransformerEncoder(
        d_model=e1 + e2, n_head=2, n_layer=0, dropout=0.0, norm_first=False,
        pos_encoding="axial", max_position=S,
        axial_pos_shape=(d1, d2), axial_pos_embds_dim=(e1, e2),
    )
    zeros = jnp.zeros((1, S, e1 + e2))
    pad = jnp.ones((1, S), bool)
    params = enc.init(jax.random.PRNGKey(0), zeros, pad)
    w0 = hf.weights[0].detach().numpy()[:, 0, :]  # (d1, e1)
    w1 = hf.weights[1].detach().numpy()[0]  # (d2, e2)
    p = dict(params["params"])
    assert p["axial_pos_0"].shape == w0.shape
    assert p["axial_pos_1"].shape == w1.shape
    p["axial_pos_0"] = jnp.asarray(w0)
    p["axial_pos_1"] = jnp.asarray(w1)
    out = enc.apply({"params": p}, zeros, pad)
    np.testing.assert_array_equal(np.asarray(out[0]), hf_term)


# --------------------------------------------------------------------------
# config + encoder integration
# --------------------------------------------------------------------------

def test_position_overflow_fails_loudly():
    """Gathers clamp out-of-range indices, so an overlong batch must be
    REJECTED before lookup (the pre-r5 slice failed with a shape error;
    the guard restores loudness for learned-absolute AND axial)."""
    for kw in (
        dict(pos_encoding="learned_absolute", max_position=8),
        dict(pos_encoding="axial", max_position=8,
             axial_pos_shape=(2, 4), axial_pos_embds_dim=(8, 8)),
    ):
        enc = TransformerEncoder(d_model=16, n_head=2, n_layer=1,
                                 dropout=0.0, **kw)
        x = jnp.zeros((1, 12, 16))
        with pytest.raises(ValueError, match="max_position"):
            enc.init(jax.random.PRNGKey(0), x, jnp.ones((1, 12), bool))


def test_reformer_lsh_knobs_scale_with_sequence_length():
    """HF Reformer scales chunk (64) and bucket count (~S/chunk) with S; a
    fixed tiny bucket count would collapse chunk coverage at long S."""
    long = tr.transformer_registry.parse("reformer").build(64, 4, 4, 2048)
    assert long.lsh_chunk_size == 64
    # ~2·S/chunk buckets → average bucket ≈ chunk/2 keys, covered by
    # own+previous chunk
    assert long.lsh_num_buckets >= 2 * (2048 // 64)
    assert long.lsh_num_buckets % 2 == 0
    short = tr.transformer_registry.parse("reformer").build(64, 4, 4, 20)
    assert short.lsh_chunk_size == 8  # inherits the local window
    assert short.lsh_num_buckets >= 4
    # explicit overrides always win
    own = tr.transformer_registry.parse("reformer").build(
        64, 4, 4, 2048, lsh_chunk_size=32, lsh_num_buckets=16
    )
    assert own.lsh_chunk_size == 32 and own.lsh_num_buckets == 16


def test_reformer_config_builds_reference_pattern():
    cfg = tr.transformer_registry.parse("reformer").build(64, 4, 4, 20)
    assert cfg.attn_layers == ("local", "lsh", "local", "lsh")
    assert cfg.pos_encoding == "axial"
    # reference: axial_pos_shape=[first_dim, total/first_dim], dims half/half
    assert cfg.axial_pos_shape[0] == 4
    assert cfg.axial_pos_shape[0] * cfg.axial_pos_shape[1] >= 22
    assert tuple(cfg.axial_pos_embds_dim) == (32, 32)
    # shallow stacks stay all-local (reference n_layer<=2 branch)
    shallow = tr.transformer_registry.parse("reformer").build(64, 4, 2, 20)
    assert shallow.attn_layers == ("local", "local")
    # local window default survives (pre-existing pins in test_model.py)
    assert cfg.local_window == 8 and cfg.lsh_chunk_size == 8


def test_reformer_encoder_forward_and_grads():
    """4-layer local/lsh reformer body: forward shape, finite nonzero grads
    through BOTH axial tables and an LSH layer's shared-QK kernel."""
    cfg = tr.transformer_registry.parse("reformer").build(32, 2, 4, 20)
    enc = cfg.to_encoder()
    B, S = 2, 22
    x = _rand((B, S, 32), 11)
    pad = jnp.ones((B, S), bool).at[:, -3:].set(False)
    params = enc.init(jax.random.PRNGKey(0), x, pad)
    assert "qk" in params["params"]["layer_1"]["attn"]  # lsh layer
    assert "q" in params["params"]["layer_0"]["attn"]  # local (dense op) layer

    def loss(p):
        return (enc.apply(p, x, pad) ** 2).sum()

    g = jax.grad(loss)(params)["params"]
    for key in ("axial_pos_0", "axial_pos_1"):
        gn = float(jnp.linalg.norm(g[key]))
        assert np.isfinite(gn) and gn > 0, key
    gqk = float(jnp.linalg.norm(g["layer_1"]["attn"]["qk"]["kernel"]))
    assert np.isfinite(gqk) and gqk > 0


def test_reformer_model_trains_end_to_end(ecommerce_schema):
    """Full model smoke: reformer body + MLM next-item head fits two steps
    (params move, loss finite) — the arch is production-usable, not just a
    forward pass."""
    from transformers4rec_tpu.data.synthetic import synthetic_data

    cfg = tr.transformer_registry.parse("reformer").build(32, 2, 4, 20)
    inputs = tr.TabularSequenceFeatures.from_schema(
        ecommerce_schema, d_output=32, masking="mlm", aggregation="concat",
    )
    model = cfg.to_model(inputs)
    batch = {
        k: jnp.asarray(v) for k, v in synthetic_data(
            ecommerce_schema, num_rows=8, max_session_length=20, seed=3
        ).items()
    }
    params, losses = model.fit(
        [batch], num_epochs=2, rng=jax.random.PRNGKey(0)
    )
    assert len(losses) == 2 and np.isfinite(np.asarray(losses)).all()
    assert float(losses[-1]) != float(losses[0])  # params moved


def test_lsh_refusals():
    """Scope guards: packing, perm-mask/two-stream, relative bias, pattern
    length, and non-uniform shared patterns all fail loudly."""
    B, S, D = 1, 8, 16
    x = jnp.zeros((B, S, D))
    pad = jnp.ones((B, S), bool)
    mk = lambda **kw: TransformerEncoder(  # noqa: E731
        d_model=D, n_head=2, n_layer=2, dropout=0.0, **kw
    )
    lsh2 = dict(attn_layers=("lsh", "lsh"), pos_encoding="none")
    seg = jnp.zeros((B, S), jnp.int32)
    with pytest.raises(NotImplementedError, match="packing"):
        mk(**lsh2).init(jax.random.PRNGKey(0), x, pad, segment_ids=seg)
    with pytest.raises(NotImplementedError, match="perm_mask|two-stream"):
        mk(**lsh2).init(
            jax.random.PRNGKey(0), x, pad, perm_mask=jnp.zeros((B, S, S))
        )
    with pytest.raises(NotImplementedError, match="relative_bias"):
        mk(attn_layers=("lsh", "lsh"), pos_encoding="relative_bias").init(
            jax.random.PRNGKey(0), x, pad
        )
    with pytest.raises(ValueError, match="entries"):
        mk(attn_layers=("local",), pos_encoding="none").init(
            jax.random.PRNGKey(0), x, pad
        )
    with pytest.raises(ValueError, match="uniform"):
        mk(attn_layers=("local", "lsh"), pos_encoding="none",
           share_layers=True).init(jax.random.PRNGKey(0), x, pad)


def test_dense_pattern_matches_legacy_single_window_path():
    """attn_layers=('local','local') must be bit-identical to the legacy
    global local_window path (same module names → same init → same math)."""
    D, S = 16, 12
    x = _rand((2, S, D), 12)
    pad = jnp.ones((2, S), bool)
    legacy = TransformerEncoder(
        d_model=D, n_head=2, n_layer=2, dropout=0.0, local_window=4,
    )
    patt = TransformerEncoder(
        d_model=D, n_head=2, n_layer=2, dropout=0.0, local_window=4,
        attn_layers=("local", "local"),
    )
    p1 = legacy.init(jax.random.PRNGKey(0), x, pad)
    p2 = patt.init(jax.random.PRNGKey(0), x, pad)
    np.testing.assert_array_equal(
        np.asarray(legacy.apply(p1, x, pad)), np.asarray(patt.apply(p2, x, pad))
    )
