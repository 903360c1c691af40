"""Golden numerics: our unified TransformerEncoder vs the actual HuggingFace
models the reference wraps (reference block/transformer.py:179-199 feeds HF
models with inputs_embeds; we re-implement the body TPU-first).

GPT-2 mode admits an EXACT weight transfer — same structure (learned absolute
positions added to inputs_embeds, embedding dropout, pre-LN blocks, final
ln_f, tanh-gelu, causal key masking) — so we load real HF GPT-2 weights into
our encoder and demand the outputs match to float32 tolerance. This pins every
piece of the shared machinery (MHA projections/scaling, softmax masking,
residual/LN order, FFN, position table) against the reference's source of
truth, not a reimplementation of it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers4rec_tpu.blocks import TransformerEncoder


def _hf_gpt2(d_model, n_head, n_layer, seq_len):
    cfg = transformers.GPT2Config(
        vocab_size=1,
        n_positions=seq_len,
        n_embd=d_model,
        n_layer=n_layer,
        n_head=n_head,
        activation_function="gelu_new",
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        layer_norm_epsilon=1e-5,
    )
    model = transformers.GPT2Model(cfg)
    model.eval()
    return model


def _transfer_gpt2_params(model, params, d_model, n_head, n_layer):
    """Map HF GPT-2 weights onto our encoder's param tree."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    H, Dh = n_head, d_model // n_head
    p = jax.tree.map(np.array, params)  # mutable copy
    enc = p["params"]

    enc["position_embedding"] = sd["wpe.weight"]
    enc["ln_f"]["scale"] = sd["ln_f.weight"]
    enc["ln_f"]["bias"] = sd["ln_f.bias"]
    for i in range(n_layer):
        ours, hf = enc[f"layer_{i}"], f"h.{i}"
        ours["ln1"]["scale"] = sd[f"{hf}.ln_1.weight"]
        ours["ln1"]["bias"] = sd[f"{hf}.ln_1.bias"]
        ours["ln2"]["scale"] = sd[f"{hf}.ln_2.weight"]
        ours["ln2"]["bias"] = sd[f"{hf}.ln_2.bias"]
        # HF Conv1D stores (in, out); c_attn packs q|k|v along out
        w = sd[f"{hf}.attn.c_attn.weight"]  # (D, 3D)
        b = sd[f"{hf}.attn.c_attn.bias"]  # (3D,)
        for j, name in enumerate(("q", "k", "v")):
            ours["attn"][name]["kernel"] = w[
                :, j * d_model : (j + 1) * d_model
            ].reshape(d_model, H, Dh)
            ours["attn"][name]["bias"] = b[
                j * d_model : (j + 1) * d_model
            ].reshape(H, Dh)
        ours["attn"]["out"]["kernel"] = sd[f"{hf}.attn.c_proj.weight"].reshape(
            H, Dh, d_model
        )
        ours["attn"]["out"]["bias"] = sd[f"{hf}.attn.c_proj.bias"]
        ours["ffn_in"]["kernel"] = sd[f"{hf}.mlp.c_fc.weight"]
        ours["ffn_in"]["bias"] = sd[f"{hf}.mlp.c_fc.bias"]
        ours["ffn_out"]["kernel"] = sd[f"{hf}.mlp.c_proj.weight"]
        ours["ffn_out"]["bias"] = sd[f"{hf}.mlp.c_proj.bias"]
    return jax.tree.map(jnp.asarray, p)


@pytest.mark.parametrize("with_padding", [False, True])
def test_gpt2_exact_weight_transfer(with_padding):
    D, H, L, B, S = 64, 4, 2, 3, 10
    torch.manual_seed(0)
    hf = _hf_gpt2(D, H, L, S)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, S, D)).astype(np.float32)
    if with_padding:
        lengths = np.array([10, 7, 4])
        mask = (np.arange(S)[None] < lengths[:, None]).astype(np.float32)
    else:
        mask = np.ones((B, S), np.float32)

    with torch.no_grad():
        want = hf(
            inputs_embeds=torch.from_numpy(x),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    enc = TransformerEncoder(
        d_model=D, n_head=H, n_layer=L, causal=True,
        pos_encoding="learned_absolute", max_position=S,
        activation="gelu", layer_norm_eps=1e-5, dropout=0.0,
    )
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _transfer_gpt2_params(hf, params, D, H, L)
    got = np.asarray(enc.apply(params, jnp.asarray(x),
                               pad_mask=jnp.asarray(mask, bool)))

    # compare valid positions (HF lets padded queries attend normally too,
    # but downstream never reads them; valid rows must match exactly)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-4)


def test_gpt2_causality_matches_hf_incremental():
    """Position t's output must be invariant to future inputs — checked the
    way HF users rely on it (truncation gives a prefix of the full run)."""
    D, H, L, B, S = 32, 2, 2, 2, 8
    enc = TransformerEncoder(
        d_model=D, n_head=H, n_layer=L, causal=True,
        pos_encoding="learned_absolute", max_position=S, dropout=0.0,
    )
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, S, D)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(1), jnp.asarray(x))
    full = np.asarray(enc.apply(params, jnp.asarray(x)))
    half = np.asarray(enc.apply(params, jnp.asarray(x[:, : S // 2])))
    np.testing.assert_allclose(full[:, : S // 2], half, rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# BERT family: post-LN + embedding LayerNorm + exact gelu admits an EXACT
# weight transfer too (reference wraps transformers.BertModel/ElectraModel
# with inputs_embeds — config/transformer.py:485-536, 315-368)
# --------------------------------------------------------------------------
def _hf_bert(d_model, n_head, n_layer, seq_len):
    cfg = transformers.BertConfig(
        vocab_size=1,
        hidden_size=d_model,
        num_hidden_layers=n_layer,
        num_attention_heads=n_head,
        intermediate_size=4 * d_model,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        max_position_embeddings=seq_len,
        layer_norm_eps=1e-12,
    )
    model = transformers.BertModel(cfg, add_pooling_layer=False)
    model.eval()
    return model


def _transfer_bert_params(model, params, d_model, n_head, n_layer):
    """Map HF BERT weights onto our post-LN encoder's param tree."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    H, Dh = n_head, d_model // n_head
    p = jax.tree.map(np.array, params)
    enc = p["params"]

    # HF adds word + position + token_type(0) embeddings then LayerNorm;
    # fold the constant token_type row into the position table
    enc["position_embedding"] = (
        sd["embeddings.position_embeddings.weight"]
        + sd["embeddings.token_type_embeddings.weight"][0][None, :]
    )
    enc["ln_emb"]["scale"] = sd["embeddings.LayerNorm.weight"]
    enc["ln_emb"]["bias"] = sd["embeddings.LayerNorm.bias"]
    for i in range(n_layer):
        ours, hf = enc[f"layer_{i}"], f"encoder.layer.{i}"
        # HF nn.Linear stores (out, in) → flax kernel (in, out)
        for name, key in (("q", "query"), ("k", "key"), ("v", "value")):
            w = sd[f"{hf}.attention.self.{key}.weight"].T  # (D, D)
            b = sd[f"{hf}.attention.self.{key}.bias"]
            ours["attn"][name]["kernel"] = w.reshape(d_model, H, Dh)
            ours["attn"][name]["bias"] = b.reshape(H, Dh)
        ours["attn"]["out"]["kernel"] = (
            sd[f"{hf}.attention.output.dense.weight"].T.reshape(H, Dh, d_model)
        )
        ours["attn"]["out"]["bias"] = sd[f"{hf}.attention.output.dense.bias"]
        # post-LN: ln1 after attention residual, ln2 after FFN residual
        ours["ln1"]["scale"] = sd[f"{hf}.attention.output.LayerNorm.weight"]
        ours["ln1"]["bias"] = sd[f"{hf}.attention.output.LayerNorm.bias"]
        ours["ffn_in"]["kernel"] = sd[f"{hf}.intermediate.dense.weight"].T
        ours["ffn_in"]["bias"] = sd[f"{hf}.intermediate.dense.bias"]
        ours["ffn_out"]["kernel"] = sd[f"{hf}.output.dense.weight"].T
        ours["ffn_out"]["bias"] = sd[f"{hf}.output.dense.bias"]
        ours["ln2"]["scale"] = sd[f"{hf}.output.LayerNorm.weight"]
        ours["ln2"]["bias"] = sd[f"{hf}.output.LayerNorm.bias"]
    return jax.tree.map(jnp.asarray, p)


@pytest.mark.parametrize("with_padding", [False, True])
def test_bert_exact_weight_transfer(with_padding):
    """Bidirectional post-LN golden: real HF BERT weights in our encoder must
    reproduce transformers.BertModel outputs to f32 tolerance (VERDICT r2
    item 3 — second exact golden beyond GPT-2)."""
    D, H, L, B, S = 64, 4, 2, 3, 10
    torch.manual_seed(0)
    hf = _hf_bert(D, H, L, S)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, S, D)).astype(np.float32)
    if with_padding:
        lengths = np.array([10, 7, 4])
        mask = (np.arange(S)[None] < lengths[:, None]).astype(np.float32)
    else:
        mask = np.ones((B, S), np.float32)

    with torch.no_grad():
        want = hf(
            inputs_embeds=torch.from_numpy(x),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    enc = TransformerEncoder(
        d_model=D, n_head=H, n_layer=L, causal=False,
        pos_encoding="learned_absolute", max_position=S,
        activation="gelu_exact", layer_norm_eps=1e-12, dropout=0.0,
        norm_first=False, embed_layer_norm=True,
    )
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _transfer_bert_params(hf, params, D, H, L)
    got = np.asarray(enc.apply(params, jnp.asarray(x),
                               pad_mask=jnp.asarray(mask, bool)))

    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-4)


def test_bert_arch_config_builds_post_ln():
    """The registered bert/electra/albert configs carry the post-LN + embed-LN
    + exact-gelu capability flags (HF fidelity by construction)."""
    from transformers4rec_tpu import transformer_registry

    for name in ("bert", "roberta", "electra", "albert", "longformer"):
        cfg = transformer_registry.parse(name).build(
            d_model=32, n_head=2, n_layer=1, total_seq_length=10
        )
        kw = cfg.encoder_kwargs()
        assert kw["norm_first"] is False, name
        assert kw["embed_layer_norm"] is True, name
        assert kw["activation"] == "gelu_exact", name
    for name in ("gpt2", "xlnet", "transfoxl", "reformer"):
        cfg = transformer_registry.parse(name).build(
            d_model=32, n_head=2, n_layer=1, total_seq_length=10
        )
        assert cfg.encoder_kwargs()["norm_first"] is True, name


# --------------------------------------------------------------------------
# XLNet/PLM behavioral golden: same perm_mask in → same information flow out.
# Exact weight transfer is impossible by design (our relative positions are
# learned bucket biases, not XLNet's sinusoidal r-stream), so pin the
# SEMANTICS instead: feed transformers.XLNetModel the reference's
# perm_mask+target_mapping (reference masking.py:660-683 builds exactly these
# tensors for HF XLNet) and assert our two-stream encoder admits/blocks the
# same input→output dependencies (occlusion pattern).
# --------------------------------------------------------------------------
def _reference_plm_perm_mask(rng, S, mask_labels):
    """perm_mask via the reference's factorization-order formula
    (masking.py:663-683): perm_mask[i,j] = (idx[i] <= idx[j]) & masked[j],
    with non-masked positions pinned to index -1 (visible to all, cannot see
    masked positions)."""
    perm_index = rng.permutation(S).astype(np.int64)
    perm_index[~mask_labels] = -1
    return (
        (perm_index[:, None] <= perm_index[None, :]) & mask_labels[None, :]
    ).astype(np.float32)


def _dependency_matrix(forward, x, tol=1e-3):
    """dep[t, p] = does output position t depend on input position p?
    The perturbation is a RANDOM direction (a constant shift would sit in
    LayerNorm's null space and register nothing)."""
    base = forward(x)
    S = x.shape[1]
    noise_rng = np.random.default_rng(99)
    dep = np.zeros((S, S), bool)
    for p in range(S):
        xp = x.copy()
        xp[0, p] += noise_rng.normal(size=x.shape[-1]).astype(np.float32) * 3.0
        out = forward(xp)
        dep[:, p] = np.abs(out - base).max(axis=-1)[0] > tol
    return dep


def test_plm_two_stream_information_flow_matches_hf_xlnet():
    D, H, L, S = 32, 2, 2, 8
    rng = np.random.default_rng(3)
    # a PLM draw: positions 2, 5, 6 masked (span-ish), rest context
    mask_labels = np.zeros(S, bool)
    mask_labels[[2, 5, 6]] = True
    perm = _reference_plm_perm_mask(rng, S, mask_labels)  # (S, S)
    x = rng.normal(size=(1, S, D)).astype(np.float32)

    # --- HF XLNet with the reference's exact tensors
    torch.manual_seed(0)
    hf = transformers.XLNetModel(
        transformers.XLNetConfig(
            vocab_size=1, d_model=D, n_layer=L, n_head=H, d_inner=4 * D,
            dropout=0.0, attn_type="bi", bi_data=False, mem_len=None,
        )
    )
    hf.eval()
    tm = torch.eye(S)[None]  # target_mapping = eye (reference masking.py:641)

    def hf_forward(xnp):
        with torch.no_grad():
            return hf(
                inputs_embeds=torch.from_numpy(xnp),
                perm_mask=torch.from_numpy(perm)[None],
                target_mapping=tm,
            ).last_hidden_state.numpy()

    hf_dep = _dependency_matrix(hf_forward, x)

    # --- our two-stream encoder, same perm_mask
    enc = TransformerEncoder(
        d_model=D, n_head=H, n_layer=L, causal=False,
        pos_encoding="relative_bias", max_position=S,
        two_stream=True, dropout=0.0,
    )
    params = enc.init(
        jax.random.PRNGKey(0), jnp.asarray(x), perm_mask=jnp.asarray(perm)[None]
    )

    def our_forward(xnp):
        return np.asarray(
            enc.apply(params, jnp.asarray(xnp), perm_mask=jnp.asarray(perm)[None])
        )

    our_dep = _dependency_matrix(our_forward, x)

    # the PLM loss reads ONLY masked positions' query-stream outputs
    # (labels are padding elsewhere) — flow must match exactly there
    masked = np.where(mask_labels)[0]
    np.testing.assert_array_equal(
        our_dep[masked], hf_dep[masked],
        err_msg=f"masked-row dependency mismatch\nours:\n{our_dep[masked]}\n"
                f"hf:\n{hf_dep[masked]}",
    )
    for t in masked:
        # a masked target must never see its own content (no label leak) …
        assert not our_dep[t, t] and not hf_dep[t, t]
        # … and must never see a masked position later in factorization order
        later = mask_labels & (perm[t] > 0)
        assert not our_dep[t][later].any()
    # sanity: context positions ARE visible to at least one target
    assert our_dep[masked][:, ~mask_labels].any()
