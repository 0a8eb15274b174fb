"""Property-based model check of the epoch-watermark key compression.

The implementation (fold_commit_keys + Snapshot.has_commit_key) must be
observationally EQUIVALENT to the naive cumulative key set it replaces —
for any interleaving of epoch and manual keys. A round-2 review found a
real key-loss bug here (below-base epochs silently dropped from the
residual), so the contract is pinned by model comparison, not examples."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_to_snowflake_data_pipeline_spark.lake.metadata import (
    Snapshot,
    fold_commit_keys,
)

keys = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=120).map(lambda e: f"epoch:{e}"),
        st.sampled_from(["manual:a", "manual:b", "compact:x"]),
    ),
    max_size=60,
)


def _snap(base, w, residual):
    return Snapshot(
        snapshot_id=0, parent_id=None, schema_json={"type": "struct", "fields": []},
        n_buckets=1, key_cols=["k"], commit_keys=residual,
        epoch_watermark=w, epoch_base=base,
    )


@given(keys)
@settings(max_examples=300, deadline=None)
def test_fold_equals_naive_cumulative_set(seq):
    base, w, residual = None, -1, []
    model: set[str] = set()
    for key in seq:
        base, w, residual = fold_commit_keys(base, w, residual, key)
        model.add(key)
        snap = _snap(base, w, residual)
        # every key ever committed is visible...
        for k in model:
            assert snap.has_commit_key(k), (k, base, w, residual)
        # ...and nothing else is (probe the full epoch range + manual keys)
        for e in range(122):
            probe = f"epoch:{e}"
            assert snap.has_commit_key(probe) == (probe in model), (
                probe, base, w, residual)
        for m in ("manual:a", "manual:b", "manual:zzz", "compact:x"):
            assert snap.has_commit_key(m) == (m in model)


@given(keys)
@settings(max_examples=200, deadline=None)
def test_contiguous_prefixes_fully_compress(seq):
    """Whenever the committed epochs form a contiguous run from their own
    minimum, the residual must hold no epoch keys at all (the O(1)-state
    guarantee for well-behaved streams)."""
    base, w, residual = None, -1, []
    model: set[int] = set()
    for key in seq:
        base, w, residual = fold_commit_keys(base, w, residual, key)
        e = key.removeprefix("epoch:")
        if e != key:
            model.add(int(e))
        if model and sorted(model) == list(range(min(model), max(model) + 1)):
            assert not any(k.startswith("epoch:") for k in residual), (
                model, base, w, residual)
