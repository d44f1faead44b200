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
