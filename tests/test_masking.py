"""Masking-scheme invariants, mirroring the reference's test strategy
(/root/reference/tests/unit/torch/test_masking.py:28-231): eval masks only the
last item, >=1 masked item per session at train, shapes/dtypes, PLM perm-mask
properties, RTD replacement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformers4rec_tpu.masking import (
    PermutationLanguageModeling,
    ReplacementLanguageModeling,
    masking_registry,
)

B, S, H = 8, 12, 16


def _item_ids(seed=0, min_len=2):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(min_len, S + 1, B)
    ids = rng.integers(1, 100, (B, S))
    mask = np.arange(S)[None, :] < lengths[:, None]
    return jnp.asarray(np.where(mask, ids, 0)), lengths


def _run(scheme, training, testing, seed=0, **kw):
    mod = masking_registry.parse(scheme)(hidden_size=H, **kw)
    ids, lengths = _item_ids(seed)
    emb = jnp.ones((B, S, H))
    variables = mod.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        emb, ids, training=training, testing=testing,
    )
    out, info = mod.apply(
        variables, emb, ids, training=training, testing=testing,
        rngs={"masking": jax.random.PRNGKey(2)},
    )
    return out, info, ids, lengths


def test_registry_names():
    for name in ("clm", "causal", "mlm", "masked", "plm", "permutation", "rtd", "replacement"):
        assert name in masking_registry


# ---------------------------------------------------------------- CLM

def test_clm_train_shift():
    out, info, ids, lengths = _run("clm", training=True, testing=False)
    # targets are shift-by-one
    np.testing.assert_array_equal(np.asarray(info.targets[:, :-1]), np.asarray(ids[:, 1:]))
    # one target per non-last non-pad position
    assert (np.asarray(info.mask).sum(1) == lengths - 1).all()
    assert out.shape == (B, S, H)


def test_clm_eval_last_item_only():
    _, info, ids, lengths = _run("clm", training=False, testing=True)
    m = np.asarray(info.mask)
    assert (m.sum(1) == 1).all()
    # the single target is the true last item
    rows = np.arange(B)
    np.testing.assert_array_equal(
        np.asarray(info.targets)[rows, lengths - 2],
        np.asarray(ids)[rows, lengths - 1],
    )


def test_clm_train_on_last_option():
    _, info, ids, lengths = _run("clm", training=True, testing=False,
                                 train_on_last_item_seq_only=True)
    assert (np.asarray(info.mask).sum(1) == 1).all()
    # input schema is the full non-pad mask in this mode
    assert (np.asarray(info.input_schema).sum(1) == lengths).all()


# ---------------------------------------------------------------- MLM

def test_mlm_train_at_least_one_masked_and_unmasked():
    _, info, ids, lengths = _run("mlm", training=True, testing=False, mlm_probability=0.3)
    m = np.asarray(info.mask).sum(1)
    assert (m >= 1).all()
    assert (m < lengths).all()  # at least one unmasked
    # targets only at non-pad positions and equal the true ids there
    tgt = np.asarray(info.targets)
    msk = np.asarray(info.mask)
    np.testing.assert_array_equal(tgt[msk], np.asarray(ids)[msk])


def test_mlm_train_extreme_probability():
    # p=1 would mask everything: invariant must still hold
    _, info, ids, lengths = _run("mlm", training=True, testing=False, mlm_probability=1.0)
    m = np.asarray(info.mask).sum(1)
    assert (m >= 1).all() and (m < lengths).all()
    _, info2, _, lengths2 = _run("mlm", training=True, testing=False, mlm_probability=0.0)
    assert (np.asarray(info2.mask).sum(1) == 1).all()  # forced one


def test_mlm_eval_last_item():
    _, info, ids, lengths = _run("mlm", training=False, testing=True)
    m = np.asarray(info.mask)
    assert (m.sum(1) == 1).all()
    rows = np.arange(B)
    np.testing.assert_array_equal(
        np.asarray(info.targets)[rows, lengths - 1], np.asarray(ids)[rows, lengths - 1]
    )


def test_mlm_inference_extends_sequence():
    out, info, ids, lengths = _run("mlm", training=False, testing=False)
    # inference appends one [MASK] position (reference masking.py:406-418)
    assert out.shape == (B, S + 1, H)
    assert info.targets.shape == (B, S + 1)
    m = np.asarray(info.mask)
    assert (m.sum(1) == 1).all()
    assert (m.argmax(1) == lengths).all()  # mask at first padded slot


# ---------------------------------------------------------------- PLM

def test_plm_train_spans_and_perm_mask():
    _, info, ids, lengths = _run("plm", training=True, testing=False)
    m = np.asarray(info.mask).sum(1)
    assert (m >= 1).all()
    assert (m < lengths).all()
    pm = np.asarray(info.perm_mask)
    assert pm.shape == (B, S, S)
    mask = np.asarray(info.mask)
    # non-masked positions are visible to everyone (column j all-zero when j unmasked)
    for b in range(B):
        unmasked_cols = ~mask[b]
        assert pm[b][:, unmasked_cols].sum() == 0
        # a masked position can never attend itself
        masked_idx = np.where(mask[b])[0]
        assert (pm[b][masked_idx, masked_idx] == 1).all()


def test_plm_eval_causal():
    _, info, ids, lengths = _run("plm", training=False, testing=True)
    pm = np.asarray(info.perm_mask)
    assert (np.asarray(info.mask).sum(1) == 1).all()
    # strictly-upper-triangular causal structure present
    for b in range(B):
        assert (np.triu(np.ones((S, S)), k=1) <= pm[b]).all()
        # nobody attends the last non-pad position
        assert (pm[b][:, lengths[b] - 1] == 1).all()


# ---------------------------------------------------------------- RTD

def test_rtd_fake_tokens():
    mod = ReplacementLanguageModeling(hidden_size=H)
    ids, lengths = _item_ids()
    # fake generator logits strongly peaked on item "50"
    logits = jnp.full((B, S, 100), -10.0).at[:, :, 50].set(10.0)
    targets = jnp.where(ids > 0, ids, 0)  # pretend all non-pad positions masked
    corrupted, disc_labels, _ = mod.get_fake_tokens(
        jax.random.PRNGKey(0), ids, targets, logits
    )
    c = np.asarray(corrupted)
    d = np.asarray(disc_labels)
    non_pad = np.asarray(ids) > 0
    # replaced positions get 50 (except where true item was already 50)
    assert ((c == 50) | ~non_pad | (np.asarray(ids) == c)).all()
    # discriminator labels: True only where replacement differs from original
    assert (d == ((c != np.asarray(ids)) & non_pad)).all()
    # pad positions untouched
    assert (c[~non_pad] == 0).all()


def test_plm_mask_ratio_distribution():
    """PLM span sampling should mask roughly plm_probability of non-pad
    positions on average (reference masking.py:599-627 semantics)."""
    import jax
    import jax.numpy as jnp

    from transformers4rec_tpu.masking import PermutationLanguageModeling

    plm = PermutationLanguageModeling(hidden_size=8, plm_probability=1 / 6)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 100, (64, 20)))
    ratios = []
    for seed in range(20):
        info = plm.compute_masked_targets(
            jax.random.PRNGKey(seed), ids, training=True
        )
        non_pad = (ids != 0).sum()
        ratios.append(float(info.mask.sum() / non_pad))
    mean_ratio = float(np.mean(ratios))
    # span sampling is bursty; the long-run mean must sit near p
    assert 0.08 < mean_ratio < 0.33, mean_ratio


def test_plm_perm_mask_properties():
    """perm_mask invariants: non-masked positions visible to everyone; masked
    position i never sees itself (reference masking.py:660-683)."""
    import jax
    import jax.numpy as jnp

    from transformers4rec_tpu.masking import PermutationLanguageModeling

    plm = PermutationLanguageModeling(hidden_size=8, plm_probability=0.3)
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 100, (8, 12)))
    info = plm.compute_masked_targets(jax.random.PRNGKey(3), ids, training=True)
    pm = np.asarray(info.perm_mask)
    mask = np.asarray(info.mask)
    for b in range(8):
        for j in range(12):
            if not mask[b, j]:
                # non-masked key visible to all queries
                assert (pm[b, :, j] == 0).all()
            else:
                # masked position cannot attend itself
                assert pm[b, j, j] == 1


def test_rtd_sample_from_batch():
    """RTD in-batch replacement sampling (reference sample_from_batch flag)."""
    import jax
    import jax.numpy as jnp

    from transformers4rec_tpu.masking import ReplacementLanguageModeling

    rtd = ReplacementLanguageModeling(hidden_size=8, sample_from_batch=True)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 50, (8, 10)))
    ids = ids.at[:, 7:].set(0)  # padded tail
    targets = jnp.where(jnp.asarray(np.random.default_rng(1).uniform(size=(8, 10))) < 0.4, ids, 0)
    corrupted, disc_labels, samples = rtd.get_fake_tokens(
        jax.random.PRNGKey(0), ids, targets
    )
    batch_vocab = set(np.asarray(ids).reshape(-1)) - {0}
    # every sampled replacement comes from the batch's own items
    assert set(np.asarray(samples).reshape(-1)) <= batch_vocab
    # non-target positions unchanged
    np.testing.assert_array_equal(
        np.asarray(corrupted)[np.asarray(targets) == 0],
        np.asarray(ids)[np.asarray(targets) == 0],
    )
    # discriminator labels only where the item actually changed
    changed = np.asarray(corrupted) != np.asarray(ids)
    np.testing.assert_array_equal(np.asarray(disc_labels), changed & (np.asarray(targets) != 0))


def test_plm_span_sampler_golden_vs_reference_semantics():
    """Golden distribution compare of the fixed-trip scan span sampler against
    a numpy oracle implementing the reference's EXACT per-row while loop
    (reference masking.py:599-627: span ~ U[1,max_span], context =
    int(span/p), start = cur + U[0, context-span], advance by context; ≥1
    mask guarantee :617-627). Statistics compared: mean masked fraction and
    the per-position masking profile."""
    import numpy as np

    def oracle(rng, max_lens, S, p, max_span):
        B = len(max_lens)
        mask = np.zeros((B, S), bool)
        for i in range(B):
            cur = 0
            max_len = max_lens[i]
            while cur < max_len:
                span = rng.integers(1, max_span + 1)
                context = int(span / p)
                start = cur + rng.integers(0, context - span + 1)
                if start < max_len:
                    mask[i, start:start + span] = True
                cur += context
            if not mask[i, :max_len].any():
                mask[i, rng.integers(0, max_len)] = True
        # clip to non-padded region (labels at pad positions are no-ops)
        for i in range(B):
            mask[i, max_lens[i]:] = False
        return mask

    for p, max_span in [(1 / 6, 5), (0.3, 3)]:
        B, S = 4096, 20
        rng_np = np.random.default_rng(0)
        max_lens = rng_np.integers(4, S + 1, B)
        ref_mask = oracle(rng_np, max_lens, S, p, max_span)

        plm = masking_registry.parse("plm")(
            hidden_size=16, plm_probability=p, max_span_length=max_span
        )
        item_ids = np.zeros((B, S), np.int32)
        for i in range(B):
            item_ids[i, :max_lens[i]] = 1 + np.arange(max_lens[i])
        info = plm.compute_masked_targets(
            jax.random.PRNGKey(1), jnp.asarray(item_ids), training=True
        )
        got_mask = np.asarray(info.mask)

        ref_frac = ref_mask.sum() / max_lens.sum()
        got_frac = got_mask.sum() / max_lens.sum()
        assert abs(ref_frac - got_frac) < 0.02, (p, ref_frac, got_frac)

        # per-position profile over rows long enough to include the position
        for pos in range(S):
            rows = max_lens > pos
            if rows.sum() < 500:
                continue
            r = ref_mask[rows, pos].mean()
            g = got_mask[rows, pos].mean()
            assert abs(r - g) < 0.04, (p, pos, r, g)

        # ≥1 masked per session in both
        assert (got_mask.sum(axis=1) >= 1).all()
        assert (ref_mask.sum(axis=1) >= 1).all()


@pytest.mark.parametrize("scheme", ["clm", "mlm"])
def test_mask_all_next_items_for_eval(scheme):
    """eval_on_last_item_seq_only=False: EVERY next item is an eval target
    (reference test_masking.py::test_mask_all_next_item_for_eval)."""
    ids = jnp.asarray([[3, 7, 9, 2, 0, 0], [5, 4, 0, 0, 0, 0]])
    m_all = masking_registry.parse(scheme)(
        hidden_size=8, eval_on_last_item_seq_only=False
    )
    info = m_all.compute_masked_targets(
        jax.random.PRNGKey(0), ids, training=False, testing=True
    )
    # CLM: target at position i is item i+1 → n_valid-1 targets per row;
    # MLM eval-all mirrors the reference (all non-pad shifted positions)
    n_targets = np.asarray(info.mask.sum(axis=1))
    np.testing.assert_array_equal(n_targets, [3, 1])

    m_last = masking_registry.parse(scheme)(
        hidden_size=8, eval_on_last_item_seq_only=True
    )
    info_last = m_last.compute_masked_targets(
        jax.random.PRNGKey(0), ids, training=False, testing=True
    )
    np.testing.assert_array_equal(np.asarray(info_last.mask.sum(axis=1)), [1, 1])
