"""Entity-linking candidate ladder (exact / zero-pad / popped-level) —
SURVEY §2.3 join_entity_link as ranked broadcast equi-joins."""

from pyspark.sql import functions as F

from open_source_legislation_spark import schemas
from open_source_legislation_spark.operators import linking

_MENTION_COLS = "conv_id string, turn_idx int, current_node string, raw_key string"


def _mentions(spark, keys):
    return spark.createDataFrame(
        [("c1", i, "conv=c1", k) for i, k in enumerate(keys)], _MENTION_COLS
    )


def test_ladder_priorities(spark, entity_dict_df):
    got = {
        r["raw_key"]: (r["entity_id"], r["link_priority"])
        for r in linking.link_mentions(
            _mentions(
                spark,
                [
                    "cfr/title=40/part=105",  # exact alias hit
                    "usc/title=5/section=7",  # only zero-padded form in dict
                    "cfr/title=40/part=999",  # part unknown → pops to title
                    "nonsense/key=1",  # total miss
                ],
            ),
            entity_dict_df,
        ).collect()
    }
    assert got["cfr/title=40/part=105"] == ("us/federal/ecfr/title=40/part=105", 1)
    assert got["usc/title=5/section=7"] == ("us/federal/usc/title=5/section=007", 2)
    assert got["cfr/title=40/part=999"] == ("us/federal/ecfr/title=40", 3)
    assert got["nonsense/key=1"] == (None, None)


def test_miss_rows_preserved_not_dropped(spark, entity_dict_df):
    linked = linking.link_mentions(
        _mentions(spark, ["nope/x=1", "cfr/title=2/part=100"]), entity_dict_df
    )
    assert linked.count() == 2
    assert linked.filter(F.col("entity_id").isNull()).count() == 1


def test_alias_index_first_writer_wins(spark):
    dup = spark.createDataFrame(
        [
            ("ent-b", "statute", None, ["k1"], None),
            ("ent-a", "statute", None, ["k1"], None),
        ],
        schemas.ENTITY_DICTIONARY,
    )
    idx = {r["alias_key"]: r["entity_id"] for r in linking.alias_index(dup).collect()}
    assert idx == {"k1": "ent-a"}


def test_broadcast_join_in_plan(spark, entity_dict_df):
    """The dictionary side must be broadcast — no shuffle for the lookup
    (SURVEY §4 broadcast-join requirement)."""
    linked = linking.link_mentions(
        _mentions(spark, ["cfr/title=40/part=105"]), entity_dict_df
    )
    plan = linked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
