"""Randomized schema fuzz: arbitrary feature mixes must build, train, and
produce finite losses/gradients end-to-end.

The reference's signature capability is schema-driven construction
(reference features/sequence.py:140-229 from_schema); this fuzz pins that
ANY well-formed schema — random counts/cardinalities of categorical and
continuous list features, random masking scheme and matching arch — flows
through from_schema → model → one value_and_grad step without shape errors,
NaNs, or dead gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transformers4rec_tpu as tr
from transformers4rec_tpu.data.synthetic import synthetic_data
from transformers4rec_tpu.schema import ColumnSchema, Schema, Tags, ValueCount

# masking scheme -> compatible archs (reference MappingTransformerMasking,
# torch/utils/torch_utils.py:441-473). MLM alternates bert (post-LN dense)
# and reformer (local/LSH attn_layers + axial positions) so the fuzz also
# drives the Reformer stack over random schemas.
ARCH_FOR = {"clm": "gpt2", "mlm": ("bert", "reformer"), "rtd": "electra",
            "plm": "xlnet"}


def _random_schema(rng: np.random.Generator, seq_len: int) -> Schema:
    cols = [
        ColumnSchema.create_categorical(
            "item_id",
            num_items=int(rng.integers(50, 5000)),
            min_index=1,
            value_count=ValueCount(2, seq_len),
            tags=[Tags.ITEM_ID, Tags.ITEM, Tags.LIST],
        )
    ]
    for i in range(rng.integers(0, 3)):
        cols.append(
            ColumnSchema.create_categorical(
                f"cat_{i}",
                num_items=int(rng.integers(5, 500)),
                min_index=1,
                value_count=ValueCount(2, seq_len),
                tags=[Tags.ITEM, Tags.LIST],
            )
        )
    for i in range(rng.integers(0, 4)):
        cols.append(
            ColumnSchema.create_continuous(
                f"cont_{i}",
                min_value=0.0,
                max_value=1.0,
                value_count=ValueCount(2, seq_len),
                tags=[Tags.ITEM, Tags.LIST],
            )
        )
    return Schema(cols)


@pytest.mark.parametrize("trial", range(6))
def test_random_schema_end_to_end(trial):
    rng = np.random.default_rng(1234 + trial)
    seq_len = int(rng.integers(6, 24))
    masking = ["clm", "mlm", "rtd", "plm"][trial % 4]
    d_model = int(rng.choice([16, 32, 48]))
    schema = _random_schema(rng, seq_len)

    # sometimes add a pretrained precomputed-vector column
    # (Tags.EMBEDDING route — features/tabular.py from_schema)
    pre_dim = int(rng.choice([0, 0, 4, 8]))
    if pre_dim:
        schema = schema + Schema([
            ColumnSchema.create_continuous(
                "pre_emb", tags=[Tags.EMBEDDING], value_count=ValueCount(2, seq_len)
            )
        ])
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=d_model, masking=masking, aggregation="concat",
        pretrained_output_dims={"pre_emb": pre_dim} if pre_dim else None,
    )
    arch = ARCH_FOR[masking]
    if isinstance(arch, tuple):
        arch = arch[trial % len(arch)]
    # reformer needs n_layer>2 for its alternating local/lsh pattern
    cfg = tr.transformer_registry.parse(arch).build(
        d_model=d_model, n_head=2,
        n_layer=4 if arch == "reformer" else 1,
        total_seq_length=seq_len,
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(
            schema.remove_by_tag(Tags.EMBEDDING), num_rows=8,
            max_session_length=seq_len, seed=trial
        ).items()
    }
    if pre_dim:
        batch["pre_emb"] = jnp.asarray(
            rng.normal(size=(8, seq_len, pre_dim)), jnp.float32
        )
    rngs = {
        "params": jax.random.PRNGKey(trial),
        "masking": jax.random.PRNGKey(trial + 1),
        "dropout": jax.random.PRNGKey(trial + 2),
        "sampling": jax.random.PRNGKey(trial + 3),
    }
    params = model.init(rngs, batch, training=True)
    apply_rngs = {k: v for k, v in rngs.items() if k != "params"}

    def loss_fn(p):
        loss, _ = model.apply(p, batch, training=True, rngs=apply_rngs)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss)), f"trial {trial}: non-finite loss"
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    # gradient must actually reach the item table (weight tying intact)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    table_norms = [
        float(jnp.linalg.norm(v))
        for path, v in flat
        if "item" in "/".join(str(p) for p in path) and v.ndim == 2
    ]
    assert table_norms and max(table_norms) > 0.0

    # inference path: (B, V) scores with finite values
    scores = model.apply(params, batch, rngs=apply_rngs)
    assert scores.shape[0] == 8 and np.all(np.isfinite(np.asarray(scores)))
