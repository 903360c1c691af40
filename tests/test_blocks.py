"""Block layer: MLPBlock, Block wrapper, SequentialBlock/`>>` composition,
and the masking-compat validation matrix — mirroring the reference's
tests/unit/torch/block/{test_base.py, test_mlp.py} coverage areas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transformers4rec_tpu as tr
from transformers4rec_tpu.blocks.base import right_shift_block

SEQ = 12


def _schema():
    from transformers4rec_tpu.data.synthetic import synthetic_ecommerce_data_schema

    return synthetic_ecommerce_data_schema(
        num_items=100, num_categories=10, max_session_length=SEQ
    )


def _batch(schema, rows=4):
    from transformers4rec_tpu.data.synthetic import synthetic_data

    return {
        k: jnp.asarray(v)
        for k, v in synthetic_data(schema, num_rows=rows,
                                   max_session_length=SEQ, seed=0).items()
    }


def test_mlp_block_shapes_and_output_size():
    mlp = tr.MLPBlock(dimensions=(32, 16), activation="relu", use_norm=True)
    assert mlp.output_size() == 16
    x = jnp.ones((4, SEQ, 8))
    params = mlp.init(jax.random.PRNGKey(0), x)
    y = mlp.apply(params, x)
    assert y.shape == (4, SEQ, 16)
    assert np.all(np.isfinite(np.asarray(y)))


def test_block_wrapper_declares_output_size():
    import flax.linen as nn

    b = tr.Block(module=nn.Dense(24), output_dim=24)
    assert b.output_size() == 24
    x = jnp.ones((2, 8))
    params = b.init(jax.random.PRNGKey(0), x)
    assert b.apply(params, x).shape == (2, 24)


def test_rshift_composition_runs_end_to_end():
    """input >> MLPBlock >> TransformerBlock threads (hidden, MaskingInfo)
    (reference block/base.py:394-434 right-shift composition)."""
    schema = _schema()
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="clm", aggregation="concat"
    )
    body = tr.SequentialBlock(blocks=(
        im,
        tr.MLPBlock(dimensions=(32,)),
        tr.TransformerBlock(
            transformer=tr.GPT2Config.build(32, 2, 1, SEQ), masking="clm"
        ),
    ))
    assert isinstance(body, tr.SequentialBlock)
    assert body.output_size() == 32
    batch = _batch(schema)
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    (hidden, info), params = body.init_with_output(rngs, batch, training=True)
    assert hidden.shape == (4, SEQ, 32)
    assert info.targets.shape == (4, SEQ)

    # `>>` / right_shift_block compose and flatten (fresh instances: flax
    # children are adopted by their first parent and can't be reused)
    sb = tr.SequentialBlock(blocks=(tr.MLPBlock(dimensions=(8,)),)) \
        >> tr.MLPBlock(dimensions=(4,))
    assert isinstance(sb, tr.SequentialBlock) and len(sb.blocks) == 2
    assert sb.output_size() == 4
    x = jnp.ones((2, 6))
    p = sb.init(jax.random.PRNGKey(0), x)
    y, _ = sb.apply(p, x)  # SequentialBlock threads (hidden, MaskingInfo)
    assert y.shape == (2, 4)
    flat = right_shift_block(tr.MLPBlock(dimensions=(3,)),
                             tr.MLPBlock(dimensions=(5,)))
    assert len(flat.blocks) == 2


def test_masking_compat_matrix_rejects_bad_pairs():
    """MASKING_COMPAT (reference torch_utils.py:441-473): electra pairs with
    RTD/MLM but not CLM; transfoxl is CLM-only; xlnet accepts all four."""
    from transformers4rec_tpu.blocks.base import check_masking_compat

    with pytest.raises(ValueError, match="not supported with masking"):
        check_masking_compat("electra", "clm")
    with pytest.raises(ValueError, match="not supported with masking"):
        tr.TransformerBlock(
            transformer=tr.TransfoXLConfig.build(16, 2, 1, SEQ), masking="mlm"
        )._resolve()


def test_masking_compat_accepts_reference_pairs():
    from transformers4rec_tpu.blocks.base import check_masking_compat

    for arch, masking in [("xlnet", "mlm"), ("xlnet", "plm"),
                          ("electra", "rtd"), ("gpt2", "clm"),
                          ("transfoxl", "clm"), ("longformer", "mlm"),
                          ("reformer", "clm"), ("bert", "mlm"),
                          ("roberta", "rtd"), ("albert", "mlm")]:
        check_masking_compat(arch, masking)  # must not raise


def test_rnn_body_next_item_prediction(ecommerce_schema):
    """GRU4Rec-style model: input module → MLP → RNNBlock body → tied
    next-item head trains end-to-end (reference
    test_head.py::test_item_prediction_with_rnn wraps torch.nn.GRU in
    tr.Block; here RNNBlock = flax nn.RNN/lax.scan)."""
    import optax

    from transformers4rec_tpu.data.synthetic import synthetic_data

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(ecommerce_schema, num_rows=8,
                                   max_session_length=20, seed=1).items()
    }
    im = tr.TabularSequenceFeatures.from_schema(
        ecommerce_schema, d_output=32, masking="clm", aggregation="concat"
    )
    for cell in ("gru", "lstm"):
        head = tr.Head(
            body=tr.SequentialBlock(blocks=(
                im,
                tr.MLPBlock(dimensions=(32,)),
                tr.RNNBlock(units=32, cell_type=cell, num_layers=2),
            )),
            tasks=(tr.NextItemPredictionTask(weight_tying=True),),
        )
        model = tr.Model(heads=(head,))
        rngs = {"params": jax.random.PRNGKey(0),
                "masking": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
                "sampling": jax.random.PRNGKey(3)}
        params = model.init(rngs, batch, training=True)
        apply_rngs = {k: v for k, v in rngs.items() if k != "params"}

        opt = optax.adam(5e-3)
        st = opt.init(params)

        @jax.jit
        def step(p, s):
            def lf(pp):
                loss, _ = model.apply(pp, batch, training=True, rngs=apply_rngs)
                return loss
            l, g = jax.value_and_grad(lf)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l

        losses = []
        for _ in range(8):
            params, st, l = step(params, st)
            losses.append(float(l))
        assert losses[-1] < losses[0], (cell, losses)
        # inference path: per-session next-item top-k
        scores, ids = model.apply(params, batch, top_k=5)
        assert ids.shape == (8, 5)


def test_rnn_rejects_packed_sessions(ecommerce_schema):
    """RNN recurrence would leak hidden state across packed sessions —
    SequentialBlock raises loudly (same contract as PLM×packing)."""
    import pytest as _pytest

    from transformers4rec_tpu.data.packing import pack_sessions
    from transformers4rec_tpu.data.synthetic import synthetic_data

    ragged = synthetic_data(ecommerce_schema, num_rows=12,
                            max_session_length=20, seed=2, ragged=True)
    packed = pack_sessions(ragged, max_len=20, item_id_col="item_id")
    batch = {k: jnp.asarray(v) for k, v in packed.items()}

    im = tr.TabularSequenceFeatures.from_schema(
        ecommerce_schema, d_output=16, masking="clm", aggregation="concat"
    )
    head = tr.Head(
        body=tr.SequentialBlock(blocks=(im, tr.RNNBlock(units=16))),
        tasks=(tr.NextItemPredictionTask(weight_tying=True),),
    )
    model = tr.Model(heads=(head,))
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2), "sampling": jax.random.PRNGKey(3)}
    with _pytest.raises(ValueError, match="packed"):
        model.init(rngs, batch, training=True)
