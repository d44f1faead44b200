"""ECS layer semantics — World/query/run_system against hand-built
component tables (the oracle-paired q_ecs_world covers the fixture
path; these pin the With/Without algebra itself).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zmaxion_spark.ecs import World


def _world(spark) -> World:
    pos = spark.createDataFrame(
        [(1, 0.0), (2, 1.0), (3, 2.0)], "entity_id long, x double"
    )
    vel = spark.createDataFrame([(1, 10.0), (2, 20.0)], "entity_id long, dx double")
    frozen = spark.createDataFrame([(2,)], "entity_id long")
    return (
        World()
        .register("pos", pos)
        .register("vel", vel)
        .register("frozen", frozen)
    )


def test_with_is_inner_join(spark):
    got = {r.entity_id for r in _world(spark).query("pos", "vel").collect()}
    assert got == {1, 2}


def test_without_is_anti_join(spark):
    got = {
        r.entity_id
        for r in _world(spark).query("pos", "vel", without=("frozen",)).collect()
    }
    assert got == {1}


def test_system_updates_component_for_matching_entities_only(spark):
    w = _world(spark)
    # Integrate position for movable (non-frozen) entities with velocity.
    w.run_system(
        "pos",
        lambda df: df.withColumn("x", F.col("x") + F.col("dx")),
        with_=("vel",),
        without=("frozen",),
    )
    got = {r.entity_id: r.x for r in w.component("pos").collect()}
    # Entity 1 moved; entity 2 (frozen) and entity 3 (no velocity) keep
    # their previous component values.
    assert got == {1: 10.0, 2: 1.0, 3: 2.0}


def test_query_requires_a_with_component(spark):
    import pytest

    with pytest.raises(ValueError):
        _world(spark).query()


def test_schedule_stages_by_component_conflict():
    """#111: disjoint-access systems share a stage; write-read and
    write-write conflicts force ordering, preserving declaration order
    among conflicting systems."""
    from zmaxion_spark.ecs import Schedule, System

    f = lambda df: df  # noqa: E731
    debit = System("debit", writes="balance", with_=("spend",), fn=f)
    score = System("score", writes="credit", with_=("urgent",), fn=f)
    settle = System("settle", writes="balance", with_=("credit",), fn=f)
    names = [[s.name for s in st] for st in Schedule(debit, score, settle).stages()]
    assert names == [["debit", "score"], ["settle"]]
    # Write-write conflict alone also forces a new stage.
    again = System("again", writes="credit", fn=f)
    names2 = [[s.name for s in st] for st in Schedule(score, again).stages()]
    assert names2 == [["score"], ["again"]]


def test_schedule_stage_reads_pre_stage_snapshot(spark):
    """Stage-mates read the same snapshot (double-buffering): a system
    whose component is written in the SAME stage by itself must not
    see its own write through another stage-mate."""
    from zmaxion_spark.ecs import ENTITY, Schedule, System, World

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], f"{ENTITY} long, v double")
    other = spark.createDataFrame([(1, 1.0), (2, 2.0)], f"{ENTITY} long, u double")
    w = World()
    w._components["v"] = base
    w._components["u"] = other
    double_v = System("double_v", writes="v", fn=lambda df: df.withColumn("v", F.col("v") * 2))
    bump_u = System("bump_u", writes="u", fn=lambda df: df.withColumn("u", F.col("u") + 1))
    Schedule(double_v, bump_u).run(w)
    got_v = {r[0]: r[1] for r in w.component("v").collect()}
    got_u = {r[0]: r[1] for r in w.component("u").collect()}
    assert got_v == {1: 20.0, 2: 40.0}
    assert got_u == {1: 2.0, 2: 3.0}


def test_schedule_checkpoint_truncates_lineage(spark):
    """Ticking with checkpoint=True must keep the component's plan
    free of the base-table scans (lineage truncated per stage) while
    producing identical values to the lazy run."""
    import contextlib
    import io

    from zmaxion_spark.ecs import ENTITY, Schedule, System, World

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], f"{ENTITY} long, v double")

    def build():
        w = World()
        w._components["v"] = base
        return w

    sys_ = System("double_v", writes="v", fn=lambda df: df.withColumn("v", F.col("v") * 2))
    lazy = Schedule(sys_, sys_).run(build())          # two ticks, lazy
    ckpt = Schedule(sys_, sys_).run(build(), checkpoint=True)
    assert sorted(map(tuple, lazy.component("v").collect())) == sorted(
        map(tuple, ckpt.component("v").collect())
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ckpt.component("v").explain()
    assert "Scan ExistingRDD" in buf.getvalue() or "LocalTableScan" in buf.getvalue()


def test_despawn_accepts_predicate_and_dataframe(spark, tmp_path):
    """World.despawn must route a Column predicate and a doomed-id
    DataFrame through the deletion-vector delete without a driver-side
    id list, and the three input shapes (predicate / DataFrame / list)
    must erase identically."""
    from zmaxion_spark.ecs import ENTITY, World

    base = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(20)], f"{ENTITY} long, v double"
    )

    def fresh(tag: str) -> str:
        root = str(tmp_path / tag)
        w = World()
        w._components["v"] = base
        w.save(root)
        return root

    survivors = {i for i in range(20) if i % 3 != 0}

    r1 = fresh("pred")
    World.despawn(spark, r1, F.col(ENTITY) % 3 == 0)
    r2 = fresh("df")
    doomed_df = base.filter(F.col(ENTITY) % 3 == 0).select(ENTITY)
    World.despawn(spark, r2, doomed_df)
    r3 = fresh("list")
    World.despawn(spark, r3, [i for i in range(20) if i % 3 == 0])

    for root in (r1, r2, r3):
        got = {
            r[0] for r in World.load(spark, root).component("v").collect()
        }
        assert got == survivors, root
