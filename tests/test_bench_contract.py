"""Bench-callable timed-stage contracts (VERDICT r7 #7).

bench.py's headline timings are only round-over-round comparable if WHAT
each name times never silently moves (commit 84bb834 re-pointed
ns_simhash_pairs at the raw pair stage when its oracle query grew census
legs — the right call, but previously only visible via archaeology).
This module pins the boundaries:

- every headline name either times its ``extended_queries()`` entry
  verbatim (boundary drift impossible without changing the oracle-checked
  query) or is declared in ``bench.BENCH_ONLY`` with a contract string;
- the BENCH_ONLY callables' output schemas are asserted to be the RAW
  stage's — census legs add a ``leg`` column, so re-pointing a callable at
  a census query fails here, a visible diff instead of a silent boundary
  move.
"""

from __future__ import annotations

import bench


def test_every_headline_name_has_a_pinned_stage():
    import __spark_entry__ as em

    extended = set(em.extended_queries())
    for name in bench.HEADLINE:
        assert name in extended or name in bench.BENCH_ONLY, (
            f"{name} is neither an oracle-checked extended_queries() entry "
            "nor declared in bench.BENCH_ONLY — its timed stage is unpinned"
        )
    # BENCH_ONLY is exactly the set of callables bench injects, each with a
    # non-empty human-readable contract
    assert set(bench.BENCH_ONLY) == set(bench.BENCH_ONLY_CALLABLES)
    assert all(isinstance(v, str) and len(v) > 20 for v in bench.BENCH_ONLY.values())
    # bench-only names must also be IN the headline set (they exist only
    # to be timed) and must not shadow a same-named queries() entry's
    # column contract silently — shadowing extended entries is allowed
    # (that is the point), but the schema checks below keep them honest.
    assert all(n in bench.HEADLINE for n in bench.BENCH_ONLY)


def test_bench_only_callables_time_the_raw_stage(spark):
    """Schema-level drift detection at sf0.001 (plan-build only + one tiny
    probe): the pair callables must return raw pair columns — any census
    graduation adds a `leg` column and changes the schema, failing here."""
    sf = "/root/testdata/sf0.001"

    mh = bench.BENCH_ONLY_CALLABLES["ns_minhash_pairs"](spark, sf)
    assert "leg" not in mh.columns
    assert {"id_a", "id_b"} <= set(mh.columns)

    sh = bench.BENCH_ONLY_CALLABLES["ns_simhash_pairs"](spark, sf)
    assert "leg" not in sh.columns
    assert {"id_a", "id_b", "hamming"} <= set(sh.columns)

    ivf = bench.BENCH_ONLY_CALLABLES["ivf_topk_pruned"](spark, sf)
    assert "leg" not in ivf.columns
    assert {"query_id", "rank"} <= set(ivf.columns)
    # the probe contract: the timed plan reads the PERSISTED index with
    # partition pruning, not the in-memory assignment
    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
