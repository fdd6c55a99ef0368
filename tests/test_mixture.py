"""Mixture balancing (sampling.mixture_sample): water-filled takes,
exact proportions, and partitioning-invariant membership."""

from pyspark.sql import functions as F

from mariadb_cdc_spark.functions.sampling import mixture_sample


def _corpus(spark):
    # 100 en, 30 zh, 10 fr docs
    rows = (
        [(i, "en") for i in range(100)]
        + [(100 + i, "zh") for i in range(30)]
        + [(130 + i, "fr") for i in range(10)]
    )
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_water_filling_binds_on_scarcest_stratum(spark):
    df = _corpus(spark)
    # targets: en 50%, zh 30%, fr 20% -> fr binds: N* = 10*10000//2000 = 50
    out = mixture_sample(
        df, "lang", {"en": 5000, "zh": 3000, "fr": 2000}, ["doc_id"]
    )
    got = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == {"en": 25, "zh": 15, "fr": 10}
    wants = {r.lang: r.mixture_want for r in out.select("lang", "mixture_want").distinct().collect()}
    assert wants == {"en": 25, "zh": 15, "fr": 10}


def test_untargeted_strata_dropped_and_cap_applies(spark):
    df = _corpus(spark)
    out = mixture_sample(
        df, "lang", {"en": 8000, "zh": 2000}, ["doc_id"], max_total=50
    )
    got = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # cap 50 binds (en could support 125, zh 150): en 40, zh 10; fr absent
    assert got == {"en": 40, "zh": 10}


def test_membership_invariant_under_repartition(spark):
    df = _corpus(spark)
    targets = {"en": 5000, "zh": 3000, "fr": 2000}
    a = mixture_sample(df, "lang", targets, ["doc_id"])
    b = mixture_sample(df.repartition(13, "doc_id"), "lang", targets, ["doc_id"])
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) == 50


def test_weighted_mixture_budgets_by_mass(spark):
    # en: 4 docs weight 10 each (mass 40); fr: 2 docs weight 5 (mass 10)
    rows = [(i, "en", 10) for i in range(4)] + [(10 + i, "fr", 5) for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    # targets en 60% / fr 40% -> fr binds: N* = 10*10000//4000 = 25
    # wants: en 15 (mass), fr 10 (mass)
    out = mixture_sample(
        df, "lang", {"en": 6000, "fr": 4000}, ["doc_id"], weight_col="w"
    )
    got = {
        r.lang: (r.n, r.mass)
        for r in out.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("w").alias("mass"))
        .collect()
    }
    # greedy prefix: en keeps 2 docs (prior 0,10 < 15; third has prior 20)
    assert got == {"en": (2, 20), "fr": (2, 10)}
    wants = {
        r.lang: r.mixture_want
        for r in out.select("lang", "mixture_want").distinct().collect()
    }
    assert wants == {"en": 15, "fr": 10}


def test_empty_target_stratum_forces_zero_corpus(spark):
    """A stratum requested in targets_bp but absent from the data must
    drive N* to 0 (no corpus can match the proportions), not be silently
    ignored by the feasibility join."""
    df = _corpus(spark)
    out = mixture_sample(
        df, "lang", {"en": 5000, "zh": 3000, "de": 2000}, ["doc_id"]
    )
    assert out.count() == 0
