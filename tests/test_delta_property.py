"""Property-based equivalence for the delta write paths (r5).

`claim_merge` / `upsert_keys` are the flagship O(batch) write paths
(VERDICT r3 next #1); their example tests pin the scheduler's shape, but
the pruning + carry + fallback machinery has branches (footer vs sidecar
stats, saturation fallback, advisory-hint fallback, quiet-round skip,
null prune values) that random inputs reach in combinations no example
test does. These properties assert, over random tables / batches /
chunkings, that the delta path is OBSERVATIONALLY IDENTICAL to the naive
semantics it replaces:

    claim_merge(keys, adds)  ==  table.anti_join(keys) UNION ALL adds
    upsert_keys(rows)        ==  table minus matched keys, plus one row
                                 per incoming key

Reference analog: the Mongo claim pop + re-insert transition
(spider/mongojobsstorage.go:165-180) — the invariant being modeled is
"the store behaves as if the whole table were rewritten", which is
exactly what the delta path must preserve while not rewriting it.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tor_spider_spark.schemas import SEEN
from tor_spider_spark.sources.tables import SnapshotTable

_dirs = itertools.count()

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
# Small structured keys mixed with int64 extremes: smalls make claims
# actually hit rows (and cluster per "host"), extremes stress footer
# min-max stats and the range layout.
KEY = st.one_of(st.integers(min_value=-50, max_value=400), I64)


def _host(url_hash: int) -> int:
    # host functionally determined by url (the invariant that makes
    # prune_col=host_hash sound for key_col=url_hash claims)
    return url_hash % 13


@st.composite
def claim_case(draw):
    base_keys = draw(st.lists(KEY, min_size=0, max_size=120, unique=True))
    # two chained claim rounds: each claims a mix of present and absent
    # keys and appends rows that may resurrect previously claimed keys
    rounds = []
    pool = st.one_of(st.sampled_from(base_keys) if base_keys else KEY, KEY)
    for _ in range(2):
        claimed = draw(st.lists(pool, min_size=0, max_size=40))
        added = draw(st.lists(pool, min_size=0, max_size=20))
        rounds.append((claimed, added))
    chunk = draw(st.sampled_from([25, 100, 10_000]))
    n_buckets = draw(st.sampled_from([1, 3]))
    return base_keys, rounds, chunk, n_buckets


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=claim_case())
def test_claim_merge_equals_anti_join_union(spark, tmp_path, case):
    base_keys, rounds, chunk, n_buckets = case
    t = SnapshotTable(
        str(tmp_path / f"p{next(_dirs)}"),
        "prop_frontier",
        SEEN,
        sort_col="host_hash",
        max_records_per_file=chunk,
    )
    rows = [(k, _host(k), 0) for k in base_keys]
    parent = t.overwrite(spark.createDataFrame(rows, SEEN), n_buckets=n_buckets)

    # multiset model: the spec is "parent rows minus rows whose key is
    # claimed, plus additions VERBATIM" — duplicate keys in additions
    # append duplicate rows, exactly like the table
    model: list[tuple] = list(rows)
    for rnd, (claimed, added) in enumerate(rounds, start=1):
        # claim keys carry the prune col (the claim_merge contract — the
        # crawl driver's batches do the same; _delta raises without it)
        keys_df = spark.createDataFrame(
            [(k, _host(k)) for k in claimed], "url_hash long, host_hash long"
        )
        add_rows = [(k, _host(k), rnd) for k in added]
        adds_df = spark.createDataFrame(add_rows, SEEN)
        parent = t.claim_merge(
            spark, keys_df, adds_df, prune_col="host_hash",
            parent=parent, n_buckets=n_buckets,
        )
        dropped = set(claimed)
        model = [r for r in model if r[0] not in dropped] + add_rows

        got = sorted(tuple(r) for r in t.read(spark, parent).collect())
        assert got == sorted(model), (rnd, chunk, n_buckets)

    # version history intact: reading the base version still returns it
    base = sorted(r[0] for r in t.read(spark, 1).collect())
    assert base == sorted(base_keys)


@st.composite
def upsert_case(draw):
    base = draw(
        st.dictionaries(KEY, st.integers(min_value=0, max_value=9), max_size=80)
    )
    # incoming rows MAY repeat a key (dup-source collapse semantics)
    incoming = draw(
        st.lists(st.tuples(KEY, st.integers(min_value=10, max_value=19)), max_size=40)
    )
    chunk = draw(st.sampled_from([30, 10_000]))
    return base, incoming, chunk


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=upsert_case())
def test_upsert_keys_is_keyed_replace(spark, tmp_path, case):
    base, incoming, chunk = case
    t = SnapshotTable(
        str(tmp_path / f"u{next(_dirs)}"),
        "prop_host_state",
        SEEN,
        sort_col="url_hash",
        max_records_per_file=chunk,
    )
    rows = [(k, _host(k), v) for k, v in base.items()]
    parent = t.overwrite(spark.createDataFrame(rows, SEEN), n_buckets=2)

    inc_rows = [(k, _host(k), v) for k, v in incoming]
    parent = t.upsert_keys(
        spark,
        spark.createDataFrame(inc_rows, SEEN),
        key_cols=("url_hash",),
        parent=parent,
        n_buckets=2,
    )

    got = {r[0]: tuple(r) for r in t.read(spark, parent).collect()}
    incoming_by_key: dict[int, set] = {}
    for r in inc_rows:
        incoming_by_key.setdefault(r[0], set()).add(r)

    # exactly one row per key, keys = base ∪ incoming
    assert set(got) == set(base) | set(incoming_by_key)
    assert t.read(spark, parent).count() == len(got)
    for k, row in got.items():
        if k in incoming_by_key:
            # dup sources collapse to ONE arbitrary incoming row
            assert row in incoming_by_key[k], (k, row)
        else:
            assert row == (k, _host(k), base[k])
