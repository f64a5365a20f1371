"""Full ETL cycle: pipeline run → materialized analysis store → reports over
the written tables → scheduled re-run. The Spark analog of the reference's
deploy → event-scheduler tick → REST report flow.
"""

from __future__ import annotations

from pathlib import Path

from openmrs_module_mamba_etl_spark.inventory.report_queries import REPORTS
from openmrs_module_mamba_etl_spark.plans.clinical import run_clinical_pipeline
from openmrs_module_mamba_etl_spark.plans.pipeline import materialize
from openmrs_module_mamba_etl_spark.streaming.scheduler import EtlScheduler


def test_full_etl_and_report_cycle(spark, sf_dir, tmp_path):
    ctx = run_clinical_pipeline(spark, sf_dir)
    assert set(ctx.tables) == {
        "mamba_dim_person",
        "mamba_dim_encounter_type",
        "mamba_dim_encounter",
        "mamba_flat_user_activity",
        "mamba_fact_order_totals",
    }

    target = str(tmp_path / "analysis_db")
    paths = materialize(spark, ctx, target)
    for p in paths.values():
        assert Path(p).exists()

    # reports now run over the *written* store (views re-registered on it)
    df = REPORTS.run(spark, "total_orders_1997")
    n = df.first()["total_orders_1997"]
    assert n > 0

    df2 = REPORTS.run(
        spark, "latest_purchase_by_user", segment="BUILDING", max_user_id=100
    )
    assert df2.count() > 0
    assert df2.columns == ["user_id", "latest_purchase_value", "segment"]

    # fact table sanity: one row per person with orders, totals positive.
    # The store publishes through the versioned log (reader-atomic), so
    # on-disk reads resolve a committed snapshot, not a raw directory.
    from openmrs_module_mamba_etl_spark.sources.txnlog import (
        VersionedParquetTable,
    )

    fact = VersionedParquetTable(paths["mamba_fact_order_totals"]).read(spark)
    assert fact.count() == fact.select("person_id").distinct().count()


def test_scheduler_drives_pipeline(spark, sf_dir, tmp_path):
    runs: list[bool] = []

    def run_once(incremental: bool) -> None:
        ctx = run_clinical_pipeline(spark, sf_dir, incremental=incremental)
        materialize(spark, ctx, str(tmp_path / "store"))
        runs.append(incremental)

    EtlScheduler(run_once, interval_seconds=0, incremental=True).run(max_ticks=2)
    assert runs == [False, True]
    assert (tmp_path / "store" / "mamba_dim_person").exists()


def test_approx_distinct_error_bound(spark, sf_dir):
    import __spark_entry__ as E

    Q = E.queries()
    approx = Q["agg_approx_distinct"](spark, sf_dir).first()["approx_customers"]
    from openmrs_module_mamba_etl_spark.sources.parquet import table
    from pyspark.sql import functions as F

    exact = table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey")
    ).first()[0]
    assert abs(approx - exact) / exact < 0.1  # HLL default rsd ≈ 5%


def test_materialize_is_reader_atomic_across_ticks(spark, sf_dir, tmp_path):
    # a report query racing a scheduler tick's re-materialization must
    # always resolve one complete committed snapshot of the served table
    # (round-9: materialize publishes through the versioned log)
    import threading

    from openmrs_module_mamba_etl_spark.sources.txnlog import (
        VersionedParquetTable,
    )

    store = str(tmp_path / "served")
    ctx = run_clinical_pipeline(spark, sf_dir)
    paths = materialize(spark, ctx, store)
    fact_path = paths["mamba_fact_order_totals"]
    expected = VersionedParquetTable(fact_path).read(spark).count()
    assert expected > 0

    errors: list[BaseException] = []
    bad: list[int] = []
    stop = threading.Event()

    def reader():
        vt = VersionedParquetTable(fact_path)
        while not stop.is_set():
            try:
                n = vt.read(spark).count()
            except BaseException as e:  # noqa: BLE001 — test records all
                errors.append(e)
                return
            if n != expected:  # every tick rebuilds the same fact table
                bad.append(n)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for _ in range(3):  # scheduler ticks re-serving the store
            ctx2 = run_clinical_pipeline(spark, sf_dir)
            materialize(spark, ctx2, store)
    finally:
        stop.set()
        t.join(timeout=120)
    assert not t.is_alive()
    assert errors == []
    assert bad == []


def test_scheduled_ticks_survive_midlife_migration(spark, tmp_path):
    """Round-10 verdict task 5: a SCHEDULED incremental pipeline whose
    target started life as a pre-log key=value-partitioned deployment
    composes with `migrate_partitioned` transparently — the first tick
    refuses (nothing destroyed), one migration call mid-life publishes
    the legacy data as v0, and subsequent scheduler ticks resume
    churn-proportional merges, ending at parity with a full rebuild of
    the same source history into a fresh target."""
    import pytest

    from openmrs_module_mamba_etl_spark.operators.incremental import (
        PartitionedLegacyLayout,
        WatermarkStore,
        incremental_refresh_parquet,
        migrate_partitioned,
        read_published,
    )
    from openmrs_module_mamba_etl_spark.sources.txnlog import (
        VersionedParquetTable,
    )

    schema = "id long, v string, audit long, part string"
    base = [(1, "a", 100, "x"), (2, "b", 100, "y"), (9, "legacy", 100, "x")]
    # per-tick source snapshots: tick 1 inserts id=3, tick 2 updates id=1;
    # id=9 vanishes from the source after deployment (retired upstream) —
    # only a MERGE of the migrated base can keep producing it, so its
    # survival is the anti-rebuild witness
    snap1 = [(1, "a", 100, "x"), (2, "b", 100, "y"), (3, "c", 200, "x")]
    snap2 = [(1, "A", 300, "x"), (2, "b", 100, "y"), (3, "c", 200, "x")]

    target = str(tmp_path / "store" / "fact")
    store = WatermarkStore(tmp_path / "wm.json")
    # the pre-log deployment: partitioned plain parquet + a live watermark
    spark.createDataFrame(base, schema).write.partitionBy("part").parquet(
        target
    )
    store.set("fact", "100")

    batches = iter([snap1, snap1, snap2])

    def run_once(_incremental: bool) -> None:
        # incremental_refresh_parquet decides full-vs-merge from the
        # watermark itself, like the reference's incremental SPs
        incremental_refresh_parquet(
            spark,
            spark.createDataFrame(next(batches), schema),
            target,
            ["id"],
            "audit",
            store,
            "fact",
        )

    sched = EtlScheduler(run_once, interval_seconds=0)
    # deploy tick against the unmigrated store: refuse, destroy nothing
    with pytest.raises(PartitionedLegacyLayout, match="migrate_partitioned"):
        sched.run(max_ticks=1)
    assert [d for d in Path(target).iterdir() if "=" in d.name]

    # the operator's one mid-life migration call; v0 = the legacy data
    migrate_partitioned(spark, target)
    assert VersionedParquetTable(target).latest_version() == 0

    # the SAME scheduler object resumes; two ticks drain snap1 (the batch
    # the refused tick consumed is re-delivered first) and snap2
    batches = iter([snap1, snap2])
    sched.run(max_ticks=2)

    got = {
        tuple(r)
        for r in read_published(spark, target)
        .select("id", "v", "audit", "part")
        .collect()
    }
    assert got == {
        (1, "A", 300, "x"),
        (2, "b", 100, "y"),
        (3, "c", 200, "x"),
        (9, "legacy", 100, "x"),  # merge-only row: a rebuild drops it
    }
    assert store.get("fact") == "300"
    # churn-proportional: exactly one committed version per post-migration
    # tick on top of the migration's v0 — no hidden full republishes
    assert VersionedParquetTable(target).latest_version() == 2

    # parity with a full rebuild: replay the same source history into a
    # fresh target from scratch — the migrated-then-ticked store must be
    # indistinguishable from one that never had a legacy-layout past
    fresh = str(tmp_path / "rebuild" / "fact")
    fstore = WatermarkStore(tmp_path / "wm_rebuild.json")
    for snap in ([base], [snap1], [snap2]):
        incremental_refresh_parquet(
            spark,
            spark.createDataFrame(snap[0], schema),
            fresh,
            ["id"],
            "audit",
            fstore,
            "fact",
        )
    rebuilt = {
        tuple(r)
        for r in read_published(spark, fresh)
        .select("id", "v", "audit", "part")
        .collect()
    }
    assert got == rebuilt


def test_stress_harness_measures_before_invariants():
    # round-9 finding pinned structurally: the brute-force invariant
    # sweep degrades the shared JVM enough to inflate later big-shuffle
    # measurements ~3x (SCALE_STRESS.md round-9 section), so main() must
    # run the measurement loop BEFORE check_invariants — this guard keeps
    # a well-meaning "validate first" refactor from re-poisoning the
    # numbers silently
    import ast
    import inspect

    from tools import scale_stress

    main_src = ast.parse(inspect.getsource(scale_stress.main))
    fn = main_src.body[0]
    measure_line = invariant_line = None
    for node in ast.walk(fn):
        if isinstance(node, ast.For) and isinstance(node.target, ast.Name) \
                and node.target.id == "entry":
            measure_line = node.lineno
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name) \
                and node.func.id == "check_invariants":
            invariant_line = node.lineno
    assert measure_line is not None and invariant_line is not None
    assert measure_line < invariant_line


def test_scheduler_on_error_continue_survives_transient_tick_failure(
    spark, sf_dir, tmp_path
):
    """Round-12 verdict task 6: the reference-faithful resilience path
    composed with REAL sinks, not just the unit-level counter test. MySQL
    fires each scheduled event independently — one failing
    sp_mamba_etl_schedule CALL doesn't cancel future events (reference:
    api/src/main/resources/mamba/mamba_main.sql:11-14) — so a mid-life
    tick whose source is transiently unreadable must be absorbed
    (on_error="continue"), leave the served store intact, and the NEXT
    tick must complete incrementally (the failed tick must not count
    toward full-vs-incremental state)."""
    from openmrs_module_mamba_etl_spark.sources.txnlog import (
        VersionedParquetTable,
    )

    store = str(tmp_path / "store")
    runs: list[bool] = []
    tick_no = {"n": 0}

    def run_once(incremental: bool) -> None:
        tick_no["n"] += 1
        if tick_no["n"] == 2:  # mid-life transient failure: source gone
            src = str(tmp_path / "no_such_source_dir")
        else:
            src = sf_dir
        ctx = run_clinical_pipeline(spark, src, incremental=incremental)
        materialize(spark, ctx, store)
        runs.append(incremental)

    sched = EtlScheduler(
        run_once, interval_seconds=0, incremental=True, on_error="continue"
    )
    sched.run(max_ticks=3)

    # tick 1 full, tick 2 failed (absorbed), tick 3 incremental
    assert runs == [False, True]
    assert sched.ticks == 2 and sched.failures == 1
    assert sched.last_error is not None
    # the served store survived the failed tick and the incremental
    # tick re-published: head snapshot is complete and consistent
    fact = VersionedParquetTable(
        str(Path(store) / "mamba_fact_order_totals")
    ).read(spark)
    assert fact.count() == fact.select("person_id").distinct().count()
    assert fact.count() > 0
