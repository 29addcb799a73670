"""Set operations (SURVEY.md §2.H).

The reference has none (its dual-sink fanout is plan sharing, not a set
op), but the engine ships the standard surface: UNION / INTERSECT /
EXCEPT with DISTINCT semantics, expressed as native Catalyst set
operators (hash-based, shuffle on the full row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _active_users(events: DataFrame, event_type: str) -> DataFrame:
    return (
        events.filter(F.col("event_type") == F.lit(event_type))
        .select("user_id")
        .distinct()
    )


def setops_users(events: DataFrame) -> DataFrame:
    """All three set operators in one driver-checkable plan: the UNION /
    INTERSECT / EXCEPT branches below, tagged and unioned (UNION ALL of
    disjointly-tagged rows — no cross-branch dedup, each branch keeps its
    own set-op semantics)."""
    return (
        purchase_or_signup_users(events)
        .select(F.lit("or").alias("op"), "user_id")
        .unionByName(
            purchase_and_error_users(events).select(
                F.lit("and").alias("op"), "user_id"
            )
        )
        .unionByName(
            view_not_purchase_users(events).select(
                F.lit("not").alias("op"), "user_id"
            )
        )
    )


def setops_users_oracle() -> str:
    return f"""
        SELECT 'or' AS op, user_id FROM ({purchase_or_signup_users_oracle()})
        UNION ALL
        SELECT 'and' AS op, user_id FROM ({purchase_and_error_users_oracle()})
        UNION ALL
        SELECT 'not' AS op, user_id FROM ({view_not_purchase_users_oracle()})
    """


def purchase_or_signup_users(events: DataFrame) -> DataFrame:
    """UNION DISTINCT of two filtered key sets."""
    return (
        _active_users(events, "purchase")
        .union(_active_users(events, "signup"))
        .distinct()
        .select("user_id")
    )


def purchase_or_signup_users_oracle() -> str:
    return """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        UNION
        SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    """


def purchase_and_error_users(events: DataFrame) -> DataFrame:
    """INTERSECT: users that both purchased and hit an error."""
    return _active_users(events, "purchase").intersect(
        _active_users(events, "error")
    )


def purchase_and_error_users_oracle() -> str:
    return """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    """


def view_not_purchase_users(events: DataFrame) -> DataFrame:
    """EXCEPT: users that viewed but never purchased."""
    return _active_users(events, "view").exceptAll(
        _active_users(events, "purchase")
    )


def view_not_purchase_users_oracle() -> str:
    return """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """
