"""Native C++ data-kernel tests: build, numerics vs numpy fallback, perf sanity."""

import numpy as np
import pytest

from transformers4rec_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native lib unavailable (no g++?)")
    return True


def _ragged(n_rows, max_items, dtype, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(0, max_items + 1, n_rows)
    offsets = np.zeros(n_rows + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    if np.issubdtype(dtype, np.floating):
        values = rng.normal(size=offsets[-1]).astype(dtype)
    else:
        values = rng.integers(1, 1000, offsets[-1]).astype(dtype)
    return values, offsets


@pytest.mark.parametrize("dtype", [np.float32, np.int64, np.int32])
def test_native_pad_matches_numpy(lib_ok, dtype):
    values, offsets = _ragged(257, 31, dtype)
    for max_len in (20, 31, 40):
        got = native.pad_ragged(values, offsets, max_len)
        # numpy reference
        n = len(offsets) - 1
        ref = np.zeros((n, max_len), dtype=dtype)
        for i in range(n):
            row = values[offsets[i]:offsets[i + 1]][:max_len]
            ref[i, :len(row)] = row
        np.testing.assert_array_equal(got, ref)


def test_native_pad_unsupported_dtype_returns_none(lib_ok):
    values = np.zeros(4, np.float64)
    offsets = np.asarray([0, 2, 4], np.int64)
    assert native.pad_ragged(values, offsets, 3) is None


def test_native_gather_matches_numpy(lib_ok):
    rng = np.random.default_rng(0)
    for shape in [(1000, 20), (1000,), (500, 4, 3)]:
        src = rng.normal(size=shape).astype(np.float32)
        idx = rng.integers(0, shape[0], 333)
        got = native.gather_rows(src, idx)
        np.testing.assert_array_equal(got, src[idx])


def test_pad_ragged_public_api_uses_native(lib_ok):
    """data.padding.pad_ragged must produce identical output either way."""
    from transformers4rec_tpu.data.padding import pad_ragged

    values, offsets = _ragged(100, 25, np.int64, seed=3)
    out = pad_ragged(values, offsets, 20)
    assert out.shape == (100, 20)
    lengths = np.minimum(offsets[1:] - offsets[:-1], 20)
    for i in (0, 50, 99):
        np.testing.assert_array_equal(
            out[i, :lengths[i]], values[offsets[i]:offsets[i] + lengths[i]]
        )
        assert (out[i, lengths[i]:] == 0).all()


def test_loader_with_native_gather(lib_ok, ecommerce_schema):
    from transformers4rec_tpu.data.loader import SyntheticDataLoader

    loader = SyntheticDataLoader.from_schema(
        ecommerce_schema, batch_size=32, num_rows=128, max_sequence_length=20
    )
    batches = list(loader)
    assert len(batches) == 4
    for b in batches:
        assert b["item_id"].shape == (32, 20)
