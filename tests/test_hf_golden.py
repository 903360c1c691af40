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
