"""Empty-partition-safe ``Dataset.join`` aggregation.

Ray 2.49's hash-shuffle join crashes whenever a hash partition receives ZERO
shards on either side: the partition builder yields a zero-column table and
pyarrow's ``Table.join`` raises ``ArrowInvalid`` ("No match or multiple
matches for key field reference ..."). That happens whenever one join side
has fewer (or more skewed) distinct keys than ``num_partitions`` — e.g. a
HAVING-filtered aggregate joined back against its fact table (q18), or late
label-propagation rounds of the connected-components near-dup resolver where
only a handful of labels remain in play. Dense fact⋈fact joins never trip it,
which is why it only surfaces at small scale / high parallelism — exactly the
regimes a correctness gate and a big cluster run in.

Fix (a subclass of the join aggregation):

1. ``accept`` remembers each input side's Arrow schema from ANY shard it
   sees (shards carry their schema even when zero-row). The same aggregator
   serves many partitions of the same join, so one sighting covers them all.
2. ``finalize`` replaces an empty side with ``schema.empty_table(...)`` and
   runs the NORMAL pyarrow join — the output then has the EXACT joined
   schema (zero rows), indistinguishable from a dense partition's result.
3. If the schema was never sighted locally (every partition of this
   aggregator missed that side), consult the cluster-wide SCHEMA REGISTRY —
   a 0-CPU named actor where every aggregator publishes each side's schema
   on first sighting. A sparse-but-globally-nonempty side (e.g. a LEFT
   OUTER flag join against a few hundred qualifying dimension rows, where
   most hash partitions receive zero right shards) is guaranteed to have
   been sighted by SOME aggregator before any finalize runs (the hash
   shuffle barriers on all sends), so the lookup succeeds and the normal
   null-padding join runs. The registry key is the join signature
   (key columns + suffixes + side); if two concurrent same-signature joins
   registered DIFFERENT schemas the lookup is ambiguous and returns
   nothing (never guesses).
4. If the registry also has nothing (side globally empty, or ambiguous),
   emit only blocks that can never poison downstream schema unification:
   the exact left table for ``left_anti`` (its output schema IS the left
   schema), a zero-row left slice for ``left_semi`` (same property), and a
   zero-column ``pa.table({})`` otherwise — Ray's builders and shuffle
   partitioners drop/unify zero-column empties, while a zero-row block
   with a PARTIAL one-sided schema would crash a downstream join keyed on
   the missing side (observed: chained q18-shaped joins). Outer joins in
   that residual case would require inventing a schema and raise loudly.

The subclass is installed by rebinding the module global that
``JoinOperator.__init__`` reads at PLAN time (``aggregation_class =
shuffle_aggregation_type or JoiningShuffleAggregation``); the aggregation
factory closure is then cloudpickled into the shuffle aggregator actors by
reference to THIS module, so the fix applies on every worker with no
site-packages edits. ``install_joinsafe()`` is idempotent.
"""

from __future__ import annotations

from ray.data._internal.execution.operators import join as _rayjoin
from ray.data._internal.logical.operators.join_operator import JoinType

_BaseAgg = _rayjoin.JoiningShuffleAggregation
# keep a handle to the ORIGINAL class even if install() ran already
while getattr(_BaseAgg, "_JOINSAFE", False):  # pragma: no cover
    _BaseAgg = _BaseAgg.__bases__[0]

_OUTER_TYPES = (JoinType.LEFT_OUTER, JoinType.RIGHT_OUTER,
                JoinType.FULL_OUTER, JoinType.RIGHT_SEMI,
                JoinType.RIGHT_ANTI)

_REGISTRY_NAME = "joinsafe_schema_registry"


class _SchemaRegistry:
    """Named 0-CPU actor: (join-signature, side) -> set of serialized Arrow
    schemas sighted by any aggregator. One tiny message per (aggregator,
    side) — O(num_aggregators) total traffic per join, independent of data
    size, so it costs nothing at 100-TB scale."""

    def __init__(self):
        self._seen: dict = {}

    def put(self, key, schema_bytes: bytes) -> None:
        self._seen.setdefault(key, set()).add(schema_bytes)

    def get(self, key):
        s = self._seen.get(key)
        if s and len(s) == 1:
            return next(iter(s))
        return None  # absent, or ambiguous across same-signature joins


_REG_HANDLE = None


def _registry():
    """Get-or-create the named registry actor. The handle is cached at
    module level in EVERY process that touches it: a named (non-detached)
    actor is ref-counted, so dropping the only handle right after a
    fire-and-forget ``put`` would let Ray kill the actor before the
    corresponding ``get`` — the cache keeps it alive for the process (and
    thus job) lifetime, while still dying with the job (no cross-session
    leakage, unlike lifetime="detached")."""
    global _REG_HANDLE
    if _REG_HANDLE is None:
        import ray

        _REG_HANDLE = (ray.remote(_SchemaRegistry)
                       .options(name=_REGISTRY_NAME, get_if_exists=True,
                                num_cpus=0)
                       .remote())
    return _REG_HANDLE


class SafeJoiningShuffleAggregation(_BaseAgg):
    """JoiningShuffleAggregation that tolerates empty partition sides."""

    _JOINSAFE = True

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._seen_schemas = {0: None, 1: None}

    def _sig(self, side: int):
        return (str(self._join_type), tuple(self._left_key_col_names),
                tuple(self._right_key_col_names),
                self._left_columns_suffix, self._right_columns_suffix, side)

    def accept(self, input_seq_id: int, partition_id: int, partition_shard):
        if (self._seen_schemas.get(input_seq_id) is None
                and hasattr(partition_shard, "schema")
                and partition_shard.num_columns > 0):
            self._seen_schemas[input_seq_id] = partition_shard.schema
            try:  # publish once per side (fire-and-forget)
                _registry().put.remote(
                    self._sig(input_seq_id),
                    partition_shard.schema.serialize().to_pybytes())
            except Exception:
                pass  # registry is best-effort; finalize re-raises if needed
        super().accept(input_seq_id, partition_id, partition_shard)

    def _lookup_schema(self, side: int):
        """Blocking registry lookup with a short retry window (puts from
        sibling aggregators are async; the shuffle barrier guarantees they
        were SENT before any finalize, not yet delivered)."""
        import time

        import pyarrow as pa
        import ray

        for _ in range(25):
            try:
                buf = ray.get(_registry().get.remote(self._sig(side)),
                              timeout=10)
            except Exception:
                return None
            if buf is not None:
                return pa.ipc.read_schema(pa.BufferReader(buf))
            time.sleep(0.2)
        return None

    def finalize(self, partition_id: int):
        import pyarrow as pa

        left = self._get_partition_builder(
            input_seq_id=0, partition_id=partition_id).build()
        right = self._get_partition_builder(
            input_seq_id=1, partition_id=partition_id).build()
        l_empty, r_empty = left.num_columns == 0, right.num_columns == 0
        if not l_empty and not r_empty:
            return super().finalize(partition_id)

        # Preferred path: rebuild the empty side(s) from a sighted schema and
        # run the real join — exact joined schema, zero rows. A side never
        # sighted locally is resolved through the cluster-wide registry
        # (sparse sides hash to few partitions; some other aggregator saw it).
        ls = left.schema if not l_empty else self._seen_schemas[0]
        rs = right.schema if not r_empty else self._seen_schemas[1]
        if self._join_type in _OUTER_TYPES:
            # Only outer joins NEED the missing schema (null-padding); the
            # retry window would stall inner/semi/anti finalizes for sides
            # that are globally empty, where the fallback below is exact.
            if ls is None:
                ls = self._lookup_schema(0)
            if rs is None:
                rs = self._lookup_schema(1)
        if ls is not None and rs is not None:
            left = left if not l_empty else ls.empty_table()
            right = right if not r_empty else rs.empty_table()
            verb = _rayjoin._JOIN_TYPE_TO_ARROW_JOIN_VERB_MAP[self._join_type]
            return left.join(
                right, join_type=verb,
                keys=list(self._left_key_col_names),
                right_keys=list(self._right_key_col_names),
                left_suffix=self._left_columns_suffix,
                right_suffix=self._right_columns_suffix)

        # Schema never sighted on the empty side: emit only poison-free
        # blocks (exact schema, or zero-column which downstream drops).
        jt = self._join_type
        if jt in _OUTER_TYPES:
            raise NotImplementedError(
                f"join partition {partition_id} got an empty side for "
                f"{jt}; null-padding needs the missing side's schema")
        if not l_empty:  # empty right, schema unknown
            if jt is JoinType.LEFT_ANTI:
                return left  # nothing to subtract: exact rows, exact schema
            if jt is JoinType.LEFT_SEMI:
                return left.slice(0, 0)  # semi output schema IS left schema
            return pa.table({})  # inner: zero rows; avoid partial schema
        return pa.table({})  # empty left (inner/semi/anti all yield no rows)


def install_joinsafe() -> None:
    """Make every subsequently planned ``Dataset.join`` empty-partition-safe."""
    _rayjoin.JoiningShuffleAggregation = SafeJoiningShuffleAggregation
