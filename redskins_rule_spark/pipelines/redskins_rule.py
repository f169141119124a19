"""The redskins-rule pipeline — full reference parity, Spark-first.

Re-expresses the reference's 355-line transform
(`jobs/transform/nfl-elec-transform-v2.py`) as a composition of the
operator library. Every stage cites the reference lines it mirrors.
Differences from the reference (all deliberate, all documented):

  * No temp-view chain, no driver-side `collect()` fold, no pandas
    sink — the sequential prediction toggle (reference :308-336) is
    relationalized into window expressions (SURVEY.md §2.10 U4), and
    the sink is `df.write.parquet`.
  * Deterministic where the reference is not:
      - argmax ties (`MAX_BY`, reference :98-99,202-210,224-225) are
        pinned with an explicit tiebreak struct — a tied game resolves
        to the HOME row (higher row_num), i.e. a tie counts as a
        Washington WIN, matching the golden output's observed behavior.
      - the challenger derivation's LAG runs over
        (elec_date, row_num), not the reference's nondeterministic
        ORDER BY elec_date alone (reference :240).
      - `row_num` is cast to long before ordering (the reference
        orders the string-typed pandas index, reference :54,106 —
        lexicographic above 9).
  * The per-file loop-union scan (reference :42-49,62-65) becomes one
    glob scan (SURVEY.md §2.1 S7).

Scale notes: every per-election relation here is inherently tiny
(O(10) candidates × O(50) elections), so the global-ordered windows
(flagged in SURVEY.md §2.5 W3) are safe; the NFL side scales with
seasons and stays partitioned by game_date until the final
broadcastable as-of join (operators/asof.py is the general scale
path for that join shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redskins_rule_spark.functions.dates import election_days
from redskins_rule_spark.operators.clean import (
    assemble_mdy_date,
    digits_to_long,
    extract_day_month,
    filter_regular_season,
    filter_unplayed,
    rename_index_column,
    strip_parenthetical,
)

FINAL_COLUMNS = [
    "elec_date", "pres_winning_party", "pres_winning_candidate",
    "count_electoral_votes", "count_popular_votes", "pop_winning_candidate",
    "pop_winning_party", "electoral_rank_desc", "popular_rank_desc",
    "challenger_pres_party", "incumbent_pres_party", "pop_incumbent_party",
    "pop_incumbent_elec_result", "game_date", "team", "final_score",
    "home_team_rnk", "winning_team", "winning_team_score", "redskins_result",
    "date_diff", "diff_rank_asc", "p_elec_date", "prediction",
    "prediction_results",
]


# ---------------------------------------------------------------------------
# NFL side (reference :52-115)
# ---------------------------------------------------------------------------


def clean_nfl_games(raw: DataFrame) -> DataFrame:
    """Raw scraped schedule rows → typed team-game rows.

    Mirrors reference :66-85 (+ the ingest-side unplayed filter,
    jobs/ingest/nfl.py:81-84): rename the pandas index column,
    extract M/d from the messy date cell, drop postseason rows
    (len(date) ≥ 10), assemble game_date, strip parenthetical team
    annotations, type the score, dedup full rows.
    """
    df = rename_index_column(raw)
    df = df.withColumn("row_num", F.col("row_num").cast("long"))
    df = filter_unplayed(df, "final")
    df = df.withColumn("day_month", extract_day_month("date"))
    df = filter_regular_season(df, "date")
    df = df.withColumn("game_date", assemble_mdy_date("day_month", "year"))
    df = df.withColumn("team", strip_parenthetical("team"))
    df = df.withColumn("final", F.col("final").cast("int"))
    return df.dropDuplicates()


def washington_home_results(games: DataFrame) -> DataFrame:
    """One row per Washington HOME game with the game's winner
    (reference :88-113).

    home_team_rnk: the raw data presents the home team as the second
    row per game (rank 2 over row_num — reference :105-106, §1.4).
    winning_team: argmax score with ties pinned to the home row
    (struct(final_score, row_num) — the reference's bare
    MAX_BY(team, final_score) is nondeterministic on ties).
    """
    w_game = Window.partitionBy("game_date")
    base = games.select(
        "game_date",
        "team",
        F.col("final").alias("final_score"),
        "row_num",
    ).withColumn(
        "home_team_rnk",
        F.rank().over(Window.partitionBy("game_date").orderBy("row_num")),
    )
    win_key = F.struct(F.col("final_score"), F.col("row_num"))
    scored = (
        base.withColumn("winning_team", F.max_by("team", win_key).over(w_game))
        .withColumn("winning_team_score", F.max("final_score").over(w_game))
        .where((F.col("team") == "Washington") & (F.col("home_team_rnk") == 2))
        .withColumn(
            "redskins_result",
            F.when(F.col("team") == F.col("winning_team"), "WIN").otherwise("LOSE"),
        )
    )
    return scored.drop("row_num")


# ---------------------------------------------------------------------------
# Elections side (reference :119-271)
# ---------------------------------------------------------------------------


def clean_elections(raw: DataFrame, seed_year: int = 1972) -> DataFrame:
    """Type year/popular_votes; keep `seed_year`+ — one election cycle
    BEFORE the first reported one, because the LAG incumbent
    derivation needs a seed row (reference :143-149 hardcodes 1972
    for start 1976). Callers must keep seed_year = start_year − 4:
    any earlier elections would all get NULL elec_date and collapse
    into one null-keyed pseudo-election in the per-election windows.
    """
    return (
        raw.withColumn("year", F.to_date("year", "yyyy"))
        .withColumn("popular_votes", digits_to_long("popular_votes"))
        .where(F.col("year") >= F.lit(f"{seed_year}-01-01").cast("date"))
    )


def attach_election_dates(elec: DataFrame, dates: DataFrame) -> DataFrame:
    """LEFT JOIN exact election day by year (reference :179-184).
    The dates side is O(#elections) — broadcast. Pre-1976 seed rows
    get a NULL elec_date (dates generation starts 1976) and sort
    first in every downstream window."""
    d = dates.select("elec_date").distinct()
    return elec.join(
        F.broadcast(d),
        F.trunc(elec["year"], "year") == F.trunc(d["elec_date"], "year"),
        "left",
    )


def election_winner_metrics(cand: DataFrame) -> DataFrame:
    """Per-election winner/challenger/incumbent metrics
    (reference :188-270) — one row per election, 13 columns.

    Shape notes vs the reference SQL:
      * the windowed MAX_BYs (:224-225,:246) and grouped MAX_BYs
        (:202-208) carry a (votes, row_num) tiebreak struct;
      * the challenger subquery's LAG (:240) is ordered by
        (elec_date, row_num) — deterministic; the reference's
        row order happened to put the winner first in every election
        except 2016, and that exact order is what its golden output
        encodes, so fixtures pin it via row_num;
      * `political_party <> prev_winning_party` keeps SQL null
        semantics: the very first row (null LAG) is excluded.
    """
    w_elec = Window.partitionBy("elec_date")
    pop_key = F.struct(F.col("popular_votes"), F.col("row_num"))
    ev_key = F.struct(F.col("electoral_votes"), F.col("row_num"))

    # foo (:219-230): per-candidate rows + per-election popular winner
    foo = cand.withColumn(
        "pop_winning_candidate", F.max_by("candidate", pop_key).over(w_elec)
    ).withColumn(
        "pop_winning_party", F.max_by("political_party", pop_key).over(w_elec)
    )

    # bar (:231-257): challenger party per election
    w_rows = Window.orderBy(F.asc_nulls_first("elec_date"), "row_num")
    bar = (
        cand.withColumn(
            "pres_winning_party", F.max_by("political_party", ev_key).over(w_elec)
        )
        .withColumn("prev_winning_party", F.lag("pres_winning_party").over(w_rows))
        .where(F.col("political_party") != F.col("prev_winning_party"))
        .withColumn(
            "rnk",
            F.rank().over(
                w_elec.orderBy(F.desc("electoral_votes"), F.col("row_num"))
            ),
        )
        .where(F.col("rnk") == 1)
        .select("elec_date", F.col("political_party").alias("challenger_pres_party"))
    )

    ranked = (
        foo.join(bar, "elec_date", "left")
        .withColumn(
            "electoral_rank_desc",
            F.rank().over(w_elec.orderBy(F.desc("electoral_votes"))),
        )
        .withColumn(
            "popular_rank_desc",
            F.rank().over(w_elec.orderBy(F.desc("popular_votes"))),
        )
        .where(F.col("electoral_rank_desc") == 1)
    )

    # winner aggregate (:200-210) — grouped argmax, one hash agg
    grouped = ranked.groupBy(
        "elec_date",
        "electoral_rank_desc",
        "popular_rank_desc",
        "pop_winning_candidate",
        "pop_winning_party",
        "challenger_pres_party",
    ).agg(
        F.max_by("political_party", ev_key).alias("pres_winning_party"),
        F.max_by("candidate", ev_key).alias("pres_winning_candidate"),
        F.max("electoral_votes").alias("count_electoral_votes"),
        F.max("popular_votes").alias("count_popular_votes"),
    )

    # incumbents via LAG over elections (:191-198); per-election grain
    # is O(10) rows — the global window is safe (SURVEY §2.5 W3)
    w_dates = Window.orderBy(F.asc_nulls_first("elec_date"))
    return (
        grouped.withColumn(
            "incumbent_pres_party", F.lag("pres_winning_party").over(w_dates)
        )
        .withColumn("pop_incumbent_party", F.lag("pop_winning_party").over(w_dates))
        .withColumn(
            "pop_incumbent_elec_result",
            F.when(
                F.col("pres_winning_party") == F.col("pop_incumbent_party"), "WIN"
            ).otherwise("LOSE"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join + predictions (reference :274-351)
# ---------------------------------------------------------------------------


def attach_last_home_game(elections: DataFrame, games: DataFrame) -> DataFrame:
    """Nearest Washington home game ≤30 days before each election
    (reference :274-292): theta LEFT JOIN with DATEDIFF ∈ [0, 30],
    then RANK() over date_diff per election, keep rank 1 (ties kept —
    RANK, not ROW_NUMBER, is the reference's semantics).

    The games side is O(games/season · seasons) — broadcast here; for
    two large sides use operators.asof.asof_join (equi-bucket rewrite
    of exactly this shape).
    """
    cond = F.datediff(elections["elec_date"], games["game_date"]).between(0, 30)
    joined = elections.join(F.broadcast(games), cond, "left").withColumn(
        "date_diff",
        F.datediff(F.col("elec_date"), F.col("game_date")).cast("long"),
    )
    w = Window.partitionBy("elec_date").orderBy(F.asc("date_diff"))
    return joined.withColumn("diff_rank_asc", F.rank().over(w)).where(
        F.col("diff_rank_asc") == 1
    )


def with_predictions(df: DataFrame) -> DataFrame:
    """The rule's prediction, as pure window expressions.

    The reference collects to the driver and folds sequentially
    (:308-336): a toggle — +1 (normal rule) when the PREVIOUS
    election's popular and electoral winners agree, −1 (flipped)
    otherwise, seeded from the first row itself (:316) — selects
    normal vs flipped prediction:
        normal : WIN → incumbent party, else challenger  (:296-300)
        flipped: LOSE → incumbent party, else challenger (:302-306)
    Relationalized: toggle_i = coalesce(LAG(split)_i, split_i) where
    split = (pop_winning_party != pres_winning_party).
    """
    w = Window.orderBy(F.asc_nulls_first("elec_date"))
    split = F.col("pop_winning_party") != F.col("pres_winning_party")
    flipped = F.coalesce(F.lag(split).over(w), split)
    normal_pred = F.when(
        F.col("redskins_result") == "WIN", F.col("incumbent_pres_party")
    ).otherwise(F.col("challenger_pres_party"))
    flipped_pred = F.when(
        F.col("redskins_result") == "LOSE", F.col("incumbent_pres_party")
    ).otherwise(F.col("challenger_pres_party"))
    return (
        df.withColumn("p_elec_date", F.col("elec_date"))
        .withColumn(
            "prediction", F.when(flipped, flipped_pred).otherwise(normal_pred)
        )
        .withColumn(
            "prediction_results",
            F.col("pres_winning_party") == F.col("prediction"),
        )
    )


# ---------------------------------------------------------------------------
# composition
# ---------------------------------------------------------------------------


def run(
    spark: SparkSession,
    nfl_raw: DataFrame,
    elections_raw: DataFrame,
    start_year: int = 1976,
    end_year: int | None = None,
) -> DataFrame:
    """Full pipeline: raw scraped tables → the 12-row × 25-col
    golden relation (reference end-to-end, :36-351)."""
    games = washington_home_results(clean_nfl_games(nfl_raw))
    dates = election_days(spark, start_year, end_year)
    cand = attach_election_dates(
        clean_elections(elections_raw, seed_year=start_year - 4), dates
    )
    elections = election_winner_metrics(cand)
    joined = attach_last_home_game(elections, games)
    final = with_predictions(joined)
    return final.where(
        F.col("elec_date") >= F.lit(f"{start_year}-01-01").cast("date")
    ).select(*FINAL_COLUMNS)


def run_from_paths(
    spark: SparkSession,
    nfl_glob: str,
    elections_glob: str,
    out_path: str | None = None,
    **kwargs,
) -> DataFrame:
    """Glob-scan variant (replaces the reference's per-file loop-union,
    :42-49/:62-65/:138-141) with a distributed parquet sink (replaces
    the `toPandas().to_parquet` driver sink, :354)."""
    nfl_raw = spark.read.parquet(nfl_glob)
    elections_raw = spark.read.parquet(elections_glob)
    result = run(spark, nfl_raw, elections_raw, **kwargs)
    if out_path:
        result.write.mode("overwrite").parquet(out_path)
    return result
