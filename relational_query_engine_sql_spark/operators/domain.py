"""Domain operators over the reference's own tables (stocks, holdings,
stocklist, friend, ...) — the query shapes SURVEY.md §2 catalogs, on
the data model they were written for.

These power the domain-semantics tests (tests/test_domain_semantics.py)
and demonstrate the reference parity on its own schema; the
driver-facing oracle queries express the same operators on the driver
test tables (plans/*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .asof import latest_per_key
from .returns import returns_panel
from .statistics import beta_vs_market, coefficient_of_variation, correlation_matrix


# --------------------------------------------------------------------------
# §3.1 — GET /api/portfolio/:id/statistics/:start/:end set-based.
# --------------------------------------------------------------------------
def portfolio_returns(
    stocks: DataFrame,
    holdings: DataFrame,
    portfolio_id: int,
    start_date: str,
    end_date: str,
) -> DataFrame:
    """Per-held-symbol daily return panel for one portfolio and window
    (the reference's CTE r — Holdings⋈Stocks + partitioned LAG,
    portfolio.js:450-463). Output: (symbol, d, r)."""
    held = holdings.filter(F.col("portfolioid") == portfolio_id).select("symbol")
    panel = (
        stocks.join(F.broadcast(held), "symbol", "left_semi")
        .filter(F.col("timestamp").between(start_date, end_date))
        .select(
            "symbol",
            F.col("timestamp").alias("d"),
            F.col("close").cast("double").alias("close"),
        )
    )
    return returns_panel(panel, key="symbol")


def portfolio_statistics(
    stocks: DataFrame,
    holdings: DataFrame,
    portfolio_id: int,
    start_date: str,
    end_date: str,
) -> tuple[DataFrame, DataFrame]:
    """COV + beta per symbol, and the pairwise correlation matrix —
    the whole statistics endpoint as 3 aggregations over ONE persisted
    returns panel (replaces the reference's 2-queries-per-holding loop
    + matrix query, portfolio.js:319-482).

    Returns (stats(symbol, cov, beta), matrix(s1, s2, correlation,
    covariance)).
    """
    r = portfolio_returns(
        stocks, holdings, portfolio_id, start_date, end_date
    ).persist()
    cov = coefficient_of_variation(r, key="symbol").withColumnRenamed(
        "symbol", "symbol"
    )
    beta = beta_vs_market(r, key="symbol")
    stats = cov.join(beta, "symbol")
    matrix = correlation_matrix(r, key="symbol")
    return stats, matrix


# --------------------------------------------------------------------------
# J7 + A7 — portfolio market value via as-of latest close
# (portfolio.js:288-303, holdings.js:46-65).
# --------------------------------------------------------------------------
def portfolio_market_value(
    stocks: DataFrame,
    holdings: DataFrame,
    as_of: str | None = None,
) -> DataFrame:
    """Market value per portfolio: shares × latest close per symbol.
    Output: (portfolioid, market_value)."""
    last_close = latest_per_key(
        stocks, keys=["symbol"], order_col="timestamp", as_of=as_of
    ).select("symbol", F.col("close").cast("double").alias("last_close"))
    return (
        holdings.join(F.broadcast(last_close), "symbol")
        .groupBy("portfolioid")
        .agg(
            F.round(F.sum(F.col("shares") * F.col("last_close")), 2).alias(
                "market_value"
            )
        )
    )


# --------------------------------------------------------------------------
# F8 — list visibility ACL: owner OR public OR shared-with
# (lists.js:155-233, EXISTS probe :168-194).
# --------------------------------------------------------------------------
def visible_lists(
    stocklist: DataFrame,
    shared_with: DataFrame,
    user_id: int,
) -> DataFrame:
    """Lists the given user may see. The EXISTS(share) arm is a
    left-semi join; the OR of the three arms is a union of filters on
    the same scan (no BNLJ)."""
    own_or_public = stocklist.filter(
        (F.col("ownerid") == user_id) | F.col("is_public")
    )
    shared = stocklist.join(
        shared_with.filter(F.col("userid") == user_id).select("listid"),
        "listid",
        "left_semi",
    )
    return own_or_public.unionByName(shared).dropDuplicates(["listid"])


# --------------------------------------------------------------------------
# F9 — review visibility: public list ∨ reviewer ∨ list owner
# (reviews.js:246-251, app-side JS filter → one boolean column).
# --------------------------------------------------------------------------
def visible_reviews(
    review: DataFrame,
    stocklist: DataFrame,
    user_id: int,
) -> DataFrame:
    lists = stocklist.select("listid", "ownerid", "is_public")
    return (
        review.join(F.broadcast(lists), "listid")
        .filter(
            F.col("is_public")
            | (F.col("userid") == user_id)
            | (F.col("ownerid") == user_id)
        )
        .drop("ownerid", "is_public")
    )


# --------------------------------------------------------------------------
# J2 — friends of a user from the normalized undirected edge list
# (users.js:68-75: OR-join → union of two equi-joins).
# --------------------------------------------------------------------------
def friends_of(friend: DataFrame, users: DataFrame, user_id: int) -> DataFrame:
    side1 = friend.filter(F.col("userid2") == user_id).select(
        F.col("userid1").alias("userid")
    )
    side2 = friend.filter(F.col("userid1") == user_id).select(
        F.col("userid2").alias("userid")
    )
    ids = side1.unionByName(side2).distinct()
    return users.join(ids, "userid", "left_semi")


# --------------------------------------------------------------------------
# J8 — friend-request validation: may A request B?
# (users.js:318-350: not already friends, no pending request either
# direction — anti-join semantics).
# --------------------------------------------------------------------------
def can_request(
    friend: DataFrame,
    request: DataFrame,
    candidates: DataFrame,
) -> DataFrame:
    """``candidates``: (fromuserid, touserid) proposed requests; returns
    the subset that passes validation."""
    norm = candidates.select(
        "fromuserid",
        "touserid",
        F.least("fromuserid", "touserid").alias("u1"),
        F.greatest("fromuserid", "touserid").alias("u2"),
    )
    not_friends = norm.join(
        friend.select(
            F.col("userid1").alias("u1"), F.col("userid2").alias("u2")
        ),
        ["u1", "u2"],
        "left_anti",
    )
    pending = request.filter(F.col("status") == "PENDING").select(
        F.least("fromuserid", "touserid").alias("u1"),
        F.greatest("fromuserid", "touserid").alias("u2"),
    )
    return not_friends.join(pending, ["u1", "u2"], "left_anti").select(
        "fromuserid", "touserid"
    )
