"""Host-side session dataloaders: Parquet → fixed-shape numpy batches.

TPU-native replacement for the reference's dataloader stack
(/root/reference/transformers4rec/torch/utils/data_utils.py:38-494):
- registry + ``from_schema`` dispatch (data_utils.py:38-61);
- the Merlin/cuDF GPU loader's roles — schema-driven column routing, ragged
  padding (``loader.map(pad_fn)`` data_utils.py:361-366), and DDP partition
  sharding (data_utils.py:349-360) — are done on host with pyarrow + numpy:
  on TPU the chips have no general-purpose cores, so input processing lives on
  the host CPU and the device only ever sees fixed-shape, ready-to-shard arrays.

Every batch has IDENTICAL shapes (tail batches are zero-filled: fill rows are
all-padding and carry zero loss/metric weight, so each real row counts exactly
once) and the jitted train step compiles exactly once. Per-host sharding for multi-host
training is row-striped by ``global_rank``/``global_size``.
"""

from __future__ import annotations

import pathlib
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..schema import Schema
from ..utils.registry import Registry
from .padding import pad_ragged
from .synthetic import synthetic_data

NDArrayDict = Dict[str, np.ndarray]

dataloader_registry: Registry = Registry("dataloader")


class T4RecDataLoader:
    """Abstract loader: iterable of fixed-shape numpy batch dicts."""

    @classmethod
    def from_schema(cls, schema: Schema, paths_or_dataset, batch_size: int, **kwargs):
        raise NotImplementedError

    @classmethod
    def parse(cls, name: str):
        return dataloader_registry.parse(name)

    def __iter__(self) -> Iterator[NDArrayDict]:
        raise NotImplementedError

    def __len__(self) -> int:
        raise NotImplementedError


def _resolve_paths(paths_or_dataset) -> List[str]:
    from .dataset import ParquetDataset

    if isinstance(paths_or_dataset, ParquetDataset):
        return [paths_or_dataset.path]
    if isinstance(paths_or_dataset, (str, pathlib.Path)):
        p = pathlib.Path(paths_or_dataset)
        if p.is_dir():
            return sorted(str(f) for f in p.glob("*.parquet"))
        return [str(p)]
    return [str(p) for p in paths_or_dataset]


def _table_to_columns(table, schema: Schema, max_sequence_length: int,
                      ragged: bool = False) -> NDArrayDict:
    """Arrow table → dict of dense numpy arrays, padding list columns.
    ``ragged=True`` keeps list columns as ``__values``/``__offsets`` pairs
    (the input layout for session packing)."""
    out: NDArrayDict = {}
    names = set(table.column_names)
    for col in schema:
        if col.name not in names:
            continue
        arr = table.column(col.name)
        import pyarrow as pa

        chunked = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_list(chunked.type) or pa.types.is_large_list(chunked.type):
            flat = np.asarray(chunked.flatten().to_numpy(zero_copy_only=False))
            offsets = np.asarray(chunked.offsets.to_numpy(zero_copy_only=False))
            # sliced arrays carry a nonzero logical offset: flatten() rebases
            # the values but .offsets does NOT — align them
            if len(offsets) and offsets[0] != 0:
                offsets = offsets - offsets[0]
            if ragged:
                out[f"{col.name}__values"] = flat
                out[f"{col.name}__offsets"] = offsets
            else:
                out[col.name] = pad_ragged(flat, offsets, max_sequence_length)
        else:
            out[col.name] = chunked.to_numpy(zero_copy_only=False)
    return out


def _prefetched(iter_fn, prefetch: int) -> Iterator[NDArrayDict]:
    """Background-thread prefetch that does NOT leak when the consumer stops
    early: the trainer abandons iterators routinely (next(iter(loader)) shape
    probes, max_steps/eval mid-epoch breaks), and a producer blocked on
    q.put with no consumer would pin its thread + buffers for the process
    lifetime. The producer polls a stop event set by the generator's
    finally (GeneratorExit on abandonment)."""
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        for b in iter_fn():
            if not _put(b):
                return
        _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
    finally:
        stop.set()


@dataloader_registry.register("parquet")
@dataloader_registry.register("merlin")  # accept the reference's engine name too
class ParquetDataLoader(T4RecDataLoader):
    """Reads parquet session files into memory, yields shuffled fixed-shape batches.

    ``global_rank``/``global_size`` stripe rows across hosts (the reference shards
    parquet partitions instead — data_utils.py:349-360; row striping balances
    better for small files). ``prefetch`` overlaps batch assembly with device
    compute via a background thread.
    """

    def __init__(
        self,
        data: NDArrayDict,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        global_rank: int = 0,
        global_size: int = 1,
        prefetch: int = 2,
    ):
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.global_size = global_size
        self._epoch = 0
        self._skip_batches = 0
        # per-host row striping
        n = len(next(iter(data.values())))
        idx = np.arange(global_rank, n, global_size)
        self.data = {k: v[idx] for k, v in data.items()}
        self.num_rows = len(idx)
        # GLOBAL row count: every process must yield the SAME number of
        # batches (a process entering the cross-process batch-assembly
        # collective one more time than its peers deadlocks), so __len__
        # derives from the global count, not the local shard's
        self.total_rows = n
        self.prefetch = prefetch

    @classmethod
    def from_schema(
        cls,
        schema: Schema,
        paths_or_dataset,
        batch_size: int,
        max_sequence_length: Optional[int] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        global_rank: int = 0,
        global_size: int = 1,
        pack: bool = False,
        **kwargs,
    ) -> "ParquetDataLoader":
        import pyarrow.parquet as pq

        max_len = max_sequence_length or schema.sequence_length(default=20)
        paths = _resolve_paths(paths_or_dataset)
        parts = []
        for path in paths:
            table = pq.read_table(path)
            parts.append(_table_to_columns(table, schema, max_len, ragged=pack))
        if not parts:
            raise ValueError(f"No parquet files found in {paths_or_dataset!r}")
        if pack:
            # session packing (data/packing.py): batches carry a segment_ids
            # key; offsets must be rebased when concatenating file parts
            from .packing import pack_sessions

            merged: NDArrayDict = {}
            for k in parts[0]:
                if k.endswith("__offsets"):
                    pieces, base = [parts[0][k]], int(parts[0][k][-1])
                    for p in parts[1:]:
                        pieces.append(p[k][1:] + base)
                        base += int(p[k][-1])
                    merged[k] = np.concatenate(pieces)
                else:
                    merged[k] = np.concatenate([p[k] for p in parts])
            data = pack_sessions(
                merged, max_len=max_len,
                item_id_col=schema.item_id_column_name,
            )
        else:
            data = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
        return cls(
            data,
            batch_size=batch_size,
            shuffle=shuffle,
            drop_last=drop_last,
            seed=seed,
            global_rank=global_rank,
            global_size=global_size,
            prefetch=kwargs.get("prefetch", 2),
        )

    def __len__(self) -> int:
        # process-count-invariant: global rows over the GLOBAL batch
        # (batch_size is per-process; every process agrees on the count)
        gbatch = self.batch_size * self.global_size
        if self.drop_last:
            return max(1, self.total_rows // gbatch) if self.total_rows >= gbatch else 1
        return -(-self.total_rows // gbatch)

    def _epoch_order(self) -> np.ndarray:
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            order = rng.permutation(self.num_rows)
        else:
            order = np.arange(self.num_rows)
        # zero-fill so every batch is full-size (static shapes for jit): fill
        # slots are marked -1 and gathered as ALL-ZERO rows, whose empty
        # target masks carry zero loss/metric weight — each real row counts
        # EXACTLY once (wrap-filling with duplicate rows double-counted tail
        # sessions in eval metrics; HF drop_last=False semantics preserved)
        total = len(self) * self.batch_size
        if total > self.num_rows:
            pad = np.full(total - self.num_rows, -1, dtype=order.dtype)
            order = np.concatenate([order, pad])
        else:
            order = order[:total]
        return order

    def set_state(self, epoch: int, batches_consumed: int) -> None:
        """Position the loader for mid-epoch resume: the next iteration
        replays epoch ``epoch``'s (deterministic) shuffle order and skips the
        first ``batches_consumed`` batches (no row gathers for the skipped
        prefix). Trainer checkpoints record this pair (SURVEY.md §5)."""
        self._epoch = epoch
        self._skip_batches = batches_consumed

    def _iter_batches(self) -> Iterator[NDArrayDict]:
        from .. import native

        order = self._epoch_order()
        self._epoch += 1
        skip = self._skip_batches * self.batch_size
        self._skip_batches = 0
        # native gather only pays when the copied bytes amortize its thread
        # fan-out: a (128, 20) int64 batch gather is ~20KB and numpy fancy
        # indexing is 5-8x faster there (benchmarks/loader_throughput.py);
        # the C++ kernel wins on multi-MB gathers (wide feature blocks).
        _NATIVE_MIN_BYTES = 4 << 20
        bytes_per_row = sum(
            v.dtype.itemsize * int(np.prod(v.shape[1:], dtype=np.int64))
            for v in self.data.values()
        )
        use_native = (
            native.available()
            and self.batch_size * bytes_per_row >= _NATIVE_MIN_BYTES
        )
        for start in range(skip, len(order), self.batch_size):
            sel = order[start : start + self.batch_size]
            fill = sel < 0
            if fill.any():  # tail batch only: numpy path + zeroed fill rows
                safe = np.where(fill, 0, sel)
                out = {k: v[safe].copy() for k, v in self.data.items()}
                for v in out.values():
                    v[fill] = 0
                yield out
            elif use_native:
                yield {k: native.gather_rows(v, sel) for k, v in self.data.items()}
            else:
                yield {k: v[sel] for k, v in self.data.items()}

    def __iter__(self) -> Iterator[NDArrayDict]:
        if self.prefetch <= 0:
            yield from self._iter_batches()
            return
        yield from _prefetched(self._iter_batches, self.prefetch)


@dataloader_registry.register("parquet_streaming")
class StreamingParquetDataLoader(T4RecDataLoader):
    """Row-group streaming loader for datasets larger than host RAM.

    The in-memory ``ParquetDataLoader`` decodes every file up front; this one
    holds only a bounded shuffle buffer (``buffer_rows``) and reads parquet
    row groups on demand — the Merlin/cuDF loader's disk-streaming role
    (reference data_utils.py:216-494) without a GPU decode stage.

    Semantics:
    - deterministic in ``(seed, epoch)``: row-group ORDER is shuffled per
      epoch, rows are shuffled within each filled buffer; re-iterating the
      same epoch replays identical batches (so ``set_state`` mid-epoch
      resume is exact — skipped batches are re-derived, not stored).
    - multi-host: row GROUPS stripe across hosts when there are at least
      ``global_size`` of them (each host reads disjoint byte ranges);
      otherwise rows stripe within the shared groups.
    - every yielded batch is exactly ``(batch_size, max_len)`` (static
      shapes); the per-epoch remainder smaller than one batch is dropped.
    - ``pack=True`` packs each buffer independently (data/packing.py) —
      fill ratio is within noise of whole-dataset packing for any buffer
      ≥ a few thousand sessions; ``__len__`` is then an estimate from the
      first packed buffer until one full epoch has been measured.
    """

    def __init__(
        self,
        paths: List[str],
        schema: Schema,
        batch_size: int,
        max_sequence_length: int,
        shuffle: bool = True,
        seed: int = 0,
        global_rank: int = 0,
        global_size: int = 1,
        pack: bool = False,
        buffer_rows: int = 65536,
        prefetch: int = 2,
        drop_last: bool = True,
    ):
        import pyarrow.parquet as pq

        self.drop_last = drop_last
        self.paths = list(paths)
        self.schema = schema
        self.batch_size = batch_size
        self.max_len = max_sequence_length
        self.shuffle = shuffle
        self.seed = seed
        self.global_rank = global_rank
        self.global_size = global_size
        self.pack = pack
        if pack and global_size > 1:
            raise ValueError(
                "StreamingParquetDataLoader(pack=True) does not support "
                "multi-process training: per-host packing produces "
                "nondeterministic per-host batch counts, which would "
                "desynchronize the cross-process batch collective. Use the "
                "in-memory ParquetDataLoader(pack=True) (packs globally "
                "before striping) or stream unpacked."
            )
        self.buffer_rows = max(buffer_rows, batch_size)
        self.prefetch = prefetch
        self._epoch = 0
        self._skip_batches = 0
        self._exact_len: Optional[int] = None  # measured after 1 packed epoch

        # (path, row_group_index, num_rows) per group, from footer metadata
        # only — no data reads at construction
        self._groups: List[tuple] = []
        for path in self.paths:
            meta = pq.ParquetFile(path).metadata
            for g in range(meta.num_row_groups):
                self._groups.append((path, g, meta.row_group(g).num_rows))
        if not self._groups:
            raise ValueError(f"No parquet row groups under {self.paths!r}")
        self._stripe_groups = len(self._groups) >= global_size
        self.total_rows = sum(g[2] for g in self._groups)
        if self._stripe_groups:
            self._my_groups = self._groups[global_rank::global_size]
            self.num_rows = sum(g[2] for g in self._my_groups)
            # every process sees ALL groups' metadata, so all agree on the
            # largest per-rank shard — the batch count is sized to IT, so no
            # rank ever drops rows and all ranks stay in collective lockstep
            # (short ranks pad with weightless zero batches)
            self._max_local_rows = max(
                sum(g[2] for g in self._groups[r::global_size])
                for r in range(global_size)
            )
        else:
            self._my_groups = list(self._groups)
            self.num_rows = len(range(global_rank, self.total_rows, global_size))
            self._max_local_rows = -(-self.total_rows // global_size)

    @classmethod
    def from_schema(
        cls,
        schema: Schema,
        paths_or_dataset,
        batch_size: int,
        max_sequence_length: Optional[int] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        global_rank: int = 0,
        global_size: int = 1,
        pack: bool = False,
        buffer_rows: int = 65536,
        **kwargs,
    ) -> "StreamingParquetDataLoader":
        max_len = max_sequence_length or schema.sequence_length(default=20)
        return cls(
            _resolve_paths(paths_or_dataset),
            schema,
            batch_size=batch_size,
            max_sequence_length=max_len,
            shuffle=shuffle,
            seed=seed,
            global_rank=global_rank,
            global_size=global_size,
            pack=pack,
            buffer_rows=buffer_rows,
            drop_last=drop_last,
            prefetch=kwargs.get("prefetch", 2),
        )

    def __len__(self) -> int:
        if not self.pack:
            # process-count-invariant: sized to the LARGEST per-rank shard
            # (identical on every process — all see all group metadata), so
            # every rank yields the same batch count (lockstep, no collective
            # deadlock) and no rank ever drops real rows
            if not self.drop_last:
                return -(-self._max_local_rows // self.batch_size)
            return max(self._max_local_rows // self.batch_size, 1)
        if self._exact_len is not None:
            return self._exact_len
        # estimate from the first buffer's measured pack ratio (sessions/row)
        if not hasattr(self, "_pack_ratio"):
            for _ in self._iter_batches(peek_ratio_only=True):
                break
        packed = int(self.num_rows / max(self._pack_ratio, 1e-9))
        return max(packed // self.batch_size, 1)

    def set_state(self, epoch: int, batches_consumed: int) -> None:
        """Mid-epoch resume (same contract as ParquetDataLoader.set_state):
        replays epoch ``epoch`` and skips its first ``batches_consumed``
        batches — the skipped prefix is re-streamed but its row gathers are
        elided."""
        self._epoch = epoch
        self._skip_batches = batches_consumed

    # ------------------------------------------------------------- internals
    def _read_group(self, path: str, group: int) -> NDArrayDict:
        import pyarrow.parquet as pq

        table = pq.ParquetFile(path).read_row_group(group)
        cols = _table_to_columns(table, self.schema, self.max_len,
                                 ragged=self.pack)
        if not self._stripe_groups and self.global_size > 1:
            # shared groups: stripe rows by host rank
            cols = _slice_rows(cols, slice(self.global_rank, None,
                                           self.global_size), self.pack)
        return cols

    def _iter_batches(self, peek_ratio_only: bool = False) -> Iterator[NDArrayDict]:
        epoch = self._epoch
        if not peek_ratio_only:
            self._epoch += 1
        skip = self._skip_batches if not peek_ratio_only else 0
        self._skip_batches = 0 if not peek_ratio_only else self._skip_batches
        rng = np.random.default_rng(self.seed + epoch)
        order = (
            rng.permutation(len(self._my_groups))
            if self.shuffle
            else np.arange(len(self._my_groups))
        )
        carry: Optional[NDArrayDict] = None  # dense rows < batch_size
        batches_out = 0
        sessions_in = 0
        rows_packed = 0
        pending: List[NDArrayDict] = []
        pending_rows = 0
        # unpacked: emit EXACTLY len(self) batches — the count is derived
        # from the GLOBAL row total so all processes stay in lockstep; local
        # shards may hold ±stripe-remainder rows vs total/global_size
        target = None if (self.pack or peek_ratio_only) else len(self)
        template: Optional[NDArrayDict] = None
        for pos, gi in enumerate(order):
            path, group, _ = self._my_groups[gi]
            cols = self._read_group(path, group)
            pending.append(cols)
            pending_rows += _n_rows(cols, self.pack)
            if pending_rows < self.buffer_rows and pos != len(order) - 1:
                continue
            rows = _merge_parts(pending, self.pack)
            pending, pending_rows = [], 0
            if self.pack:
                sessions_in += _n_rows(rows, ragged=True)
                from .packing import pack_sessions

                rows = pack_sessions(
                    rows, max_len=self.max_len,
                    item_id_col=self.schema.item_id_column_name,
                )
                rows_packed += _n_rows(rows, ragged=False)
                self._pack_ratio = sessions_in / max(rows_packed, 1)
                if peek_ratio_only:
                    return
            if carry is not None:
                rows = {k: np.concatenate([carry[k], rows[k]]) for k in rows}
                carry = None
            n = _n_rows(rows, ragged=False)
            template = rows
            perm = rng.permutation(n) if self.shuffle else np.arange(n)
            full = (n // self.batch_size) * self.batch_size
            for start in range(0, full, self.batch_size):
                sel = perm[start : start + self.batch_size]
                if target is not None and batches_out >= target:
                    # local shard overshoots the global batch count: the
                    # remaining LOCAL rows cannot be yielded without breaking
                    # cross-process lockstep. Group striping balances group
                    # counts, not rows — size row groups evenly to avoid this.
                    import warnings

                    warnings.warn(
                        f"StreamingParquetDataLoader: dropping {n - start} "
                        f"surplus local rows to keep the global batch count "
                        f"({target}) in lockstep across processes; write "
                        f"more evenly sized row groups to avoid data loss",
                        stacklevel=2,
                    )
                    break
                batches_out += 1
                if batches_out > skip:
                    yield {k: v[sel] for k, v in rows.items()}
            if n > full:
                sel = perm[full:]
                carry = {k: v[sel] for k, v in rows.items()}
        if (carry is not None
                and (not self.drop_last or batches_out == 0)
                and (target is None or batches_out < target)):
            # zero-fill the final partial batch to full size (static shapes);
            # fill rows are all-padding sessions with zero loss/metric weight
            m = _n_rows(carry, ragged=False)
            pad = self.batch_size - m
            batch = {
                k: np.concatenate(
                    [v, np.zeros((pad, *v.shape[1:]), dtype=v.dtype)]
                )
                for k, v in carry.items()
            }
            batches_out += 1
            if batches_out > skip and not peek_ratio_only:
                yield batch
        # lockstep shortfall: a local shard with fewer rows than its peers
        # still owes the collective its batches — emit all-zero (weightless)
        # batches up to the global count
        while (target is not None and batches_out < target
               and template is not None):
            batch = {
                k: np.zeros((self.batch_size, *v.shape[1:]), dtype=v.dtype)
                for k, v in template.items()
            }
            batches_out += 1
            if batches_out > skip and not peek_ratio_only:
                yield batch
        # trailing partial batch otherwise dropped (static shapes); record
        # the exact packed length after one full epoch
        if self.pack and skip == 0:
            self._exact_len = batches_out

    def __iter__(self) -> Iterator[NDArrayDict]:
        if self.prefetch <= 0:
            yield from self._iter_batches()
            return
        yield from _prefetched(self._iter_batches, self.prefetch)


def _n_rows(cols: NDArrayDict, ragged: bool) -> int:
    if ragged:
        k = next(k for k in cols if k.endswith("__offsets"))
        return len(cols[k]) - 1
    return len(next(iter(cols.values())))


def _slice_rows(cols: NDArrayDict, sel, ragged: bool) -> NDArrayDict:
    if not ragged:
        return {k: v[sel] for k, v in cols.items()}
    out: NDArrayDict = {}
    n = _n_rows(cols, ragged=True)
    rows = np.arange(n)[sel]
    for k, v in cols.items():
        if k.endswith("__offsets"):
            name = k.removesuffix("__offsets")
            vals = cols[f"{name}__values"]
            lengths = np.diff(v)[rows]
            starts = v[:-1][rows]
            new_vals = np.concatenate(
                [vals[s : s + l] for s, l in zip(starts, lengths)]
            ) if len(rows) else vals[:0]
            out[f"{name}__values"] = new_vals
            out[k] = np.concatenate([[0], np.cumsum(lengths)]).astype(v.dtype)
        elif f"{k}__offsets" in cols or k.endswith("__values"):
            continue  # handled with its offsets pair
        else:
            out[k] = v[rows]
    return out


def _merge_parts(parts: List[NDArrayDict], ragged: bool) -> NDArrayDict:
    if len(parts) == 1:
        return parts[0]
    merged: NDArrayDict = {}
    for k in parts[0]:
        if ragged and k.endswith("__offsets"):
            pieces, base = [parts[0][k]], int(parts[0][k][-1])
            for p in parts[1:]:
                pieces.append(p[k][1:] + base)
                base += int(p[k][-1])
            merged[k] = np.concatenate(pieces)
        else:
            merged[k] = np.concatenate([p[k] for p in parts])
    return merged


@dataloader_registry.register("synthetic")
class SyntheticDataLoader(ParquetDataLoader):
    """Loader over schema-synthesized data — the test/CI engine (no files needed)."""

    @classmethod
    def from_schema(
        cls,
        schema: Schema,
        paths_or_dataset=None,
        batch_size: int = 16,
        max_sequence_length: Optional[int] = None,
        num_rows: int = 256,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        global_rank: int = 0,
        global_size: int = 1,
        pack: bool = False,
        **kwargs,
    ) -> "SyntheticDataLoader":
        max_len = max_sequence_length or schema.sequence_length(default=20)
        data = synthetic_data(
            schema,
            num_rows=num_rows,
            max_session_length=max_len,
            ragged=pack,
            seed=seed,
        )
        if pack:
            from .packing import pack_sessions

            data = pack_sessions(data, max_len=max_len,
                                 item_id_col=schema.item_id_column_name)
        return cls(
            data,
            batch_size=batch_size,
            shuffle=shuffle,
            drop_last=drop_last,
            seed=seed,
            global_rank=global_rank,
            global_size=global_size,
            prefetch=kwargs.get("prefetch", 2),
        )
