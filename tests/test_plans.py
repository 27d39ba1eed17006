"""Physical-plan quality gates: these fail if a future change regresses
pushdown, pruning, broadcast strategy, or the top-k plan shape."""

import pytest

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from texoo_spark.session import get_spark
    s = get_spark("texoo-plan-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_partial_agg(spark):
    import __spark_entry__ as e
    plan = plan_of(e.q_pricing_summary(spark, SF))
    assert "PushedFilters" in plan and "l_shipdate" in plan
    # map-side partial aggregation before the exchange
    assert plan.count("HashAggregate") >= 2
    # column pruning: unused lineitem columns never reach the scan
    assert "l_partkey" not in plan.split("ReadSchema")[1][:400]


def test_nation_revenue_broadcasts_small_dim(spark):
    import __spark_entry__ as e
    plan = plan_of(e.q_nation_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_knn_is_take_ordered(spark):
    import __spark_entry__ as e
    plan = plan_of(e.q_knn_cosine(spark, SF))
    # top-k must not globally sort: TakeOrderedAndProject merges per-partition
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan  # cosine stays JVM-side


def test_extraction_is_single_python_hop(spark):
    from texoo_spark.pipeline import extract_turns
    df = spark.createDataFrame(
        [("c", 0, "user", "text here", None)],
        "conv_id string, turn_idx int, role string, text string, tool string")
    plan = plan_of(extract_turns(df))
    assert plan.count("ArrowEvalPython") == 1  # fused strip+extract


def test_extract_tokens_prunes_documents_scan(spark):
    import __spark_entry__ as e
    plan = plan_of(e.q_extract_tokens(spark, SF))
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "text" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema


def test_gazetteer_matches_wholestage_codegen(spark):
    import __spark_entry__ as e
    plan = plan_of(e.q_gazetteer_matches(spark, SF))
    assert "*(" in plan  # '*(n)' marks whole-stage-codegen spans


def test_bm25_broadcasts_query_side(spark):
    import __spark_entry__ as e
    plan = plan_of(e.q_bm25_scores(spark, SF))
    # query terms + df table broadcast; postings never a broadcast side
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2  # partial aggs survive


def test_lean_extraction_single_python_hop(spark):
    from texoo_spark.pipeline import extract_turns
    df = spark.createDataFrame(
        [("c", 0, "user", "text here", None)],
        "conv_id string, turn_idx int, role string, text string, tool string")
    plan = plan_of(extract_turns(df, lean=True))
    assert plan.count("ArrowEvalPython") == 1
    assert "tok_text" not in plan  # lean schema never materializes surfaces
