"""JDBC dialect surface for the S1/S8–S14 sink lifecycle.

The reference runs its warehouse lifecycle against PostgreSQL
(``src/common/trgx.clj:80-98`` — the ``pg-spec``/``pg-tap`` connection with
SSL client certs; ``:118-127`` — DELETE-range + CREATE TABLE IF NOT EXISTS;
``:188-193`` — the ``replace-into-ods`` schema swap;
``src/bolome/mlin/d_bolome_user_order.clj:151-153`` — NUMERIC(18,3) money
columns; ``:181-184`` — the raw ``DELETE … USING rng`` reload guard).

This module renders those statements per dialect and records where the two
test backends differ, so a user pointing the engine at the reference's
actual Postgres hits no seams the suite has not exercised:

=====================  =======================  ==========================
surface                PostgreSQL               Derby (embedded test twin)
=====================  =======================  ==========================
CREATE TABLE IF        native                   unsupported → plain CREATE
  NOT EXISTS                                      + ignore already-exists
TRUNCATE               ``TRUNCATE TABLE t``     same (no CASCADE variants
                                                  used by the reference)
DELETE range           BETWEEN on CHAR(10) dts  same
DELETE … USING         native                   unsupported → EXISTS
                                                  subquery rewrite
ALTER TABLE …          native (the 3-statement  no schemas-as-namespaces
  SET SCHEMA             replace-into-ods swap)   move → swap untestable;
                                                  PG-only test
NUMERIC(18,3)          exact, scale-preserving  same (both round-trip the
                                                  boundary 15+3 digits)
SSL conn props         libpq-style JDBC props   n/a (in-memory)
=====================  =======================  ==========================

How each side is tested: Spark's JDBC *reader/writer mechanics* run against
embedded Derby (``tests/test_io_lifecycle.py`` — the only JDBC driver jar
shipped with this Spark); the *PostgreSQL dialect statements* rendered here
run against a real scratch PostgreSQL 15 server via psql
(``tests/test_pg_dialect.py`` — no PG JDBC jar in the sandbox, so the
server is driven through the client CLI; statement text is identical
either way because every renderer below is transport-agnostic SQL).
"""

from __future__ import annotations

#: Connection-property surface of the reference's ``pg-spec``
#: (trgx.clj:80-93). Values here are PLACEHOLDERS the caller overrides —
#: the keys are the contract (what a migration user's existing config
#: carries over 1:1 into ``jdbc_read``/``jdbc_append`` properties).
PG_SSL_PROPERTY_KEYS = (
    "user",
    "password",
    "ssl",
    "sslmode",
    "characterEncoding",
    "stringtype",
    "sslkey",
    "sslcert",
    "sslrootcert",
    "sslfactory",
)


def pg_connection_properties(
    user: str,
    password: str,
    *,
    sslmode: str = "require",
    sslkey: str | None = None,
    sslcert: str | None = None,
    sslrootcert: str | None = None,
    sslfactory: str = "org.postgresql.ssl.jdbc4.LibPQFactory",
) -> dict[str, str]:
    """JDBC properties matching the reference's ``pg-spec``/``pg-tap`` URL
    (trgx.clj:80-98): SSL required with libpq-layout client certs,
    ``stringtype=unspecified`` so CHAR(10)/TEXT date columns accept plain
    string binds, utf-8 wire encoding."""
    props = {
        "user": user,
        "password": password,
        "driver": "org.postgresql.Driver",
        "characterEncoding": "utf-8",
        "stringtype": "unspecified",
    }
    if sslmode != "disable":
        props.update({"ssl": "true", "sslmode": sslmode, "sslfactory": sslfactory})
        if sslkey:
            props["sslkey"] = sslkey
        if sslcert:
            props["sslcert"] = sslcert
        if sslrootcert:
            props["sslrootcert"] = sslrootcert
    return props


def render_delete_using_range(
    target_table: str,
    rng_table: str,
    date_col: str = "dw_dt",
    alias: str = "tgt",
) -> str:
    """The raw idempotent-reload guard (mlin/d_bolome_user_order.clj:181-184):
    delete the target rows whose date falls in any ACTIVE load range before
    re-appending — PostgreSQL ``DELETE … USING`` join-delete."""
    return (
        f"DELETE FROM {target_table} {alias}\n"
        f"USING {rng_table} rng\n"
        f"WHERE rng.dw_in_use = '1'\n"
        f"AND {alias}.{date_col} BETWEEN rng.dw_start_dt AND rng.dw_end_dt"
    )


def render_delete_using_range_derby(
    target_table: str,
    rng_table: str,
    date_col: str = "dw_dt",
) -> str:
    """Derby twin of :func:`render_delete_using_range` — Derby has no
    ``DELETE … USING``, so the same predicate becomes an EXISTS subquery
    (semantically identical for this non-correlated-update delete)."""
    return (
        f"DELETE FROM {target_table} WHERE EXISTS ("
        f"SELECT 1 FROM {rng_table} rng WHERE rng.dw_in_use = '1' "
        f"AND {target_table}.{date_col} BETWEEN rng.dw_start_dt AND rng.dw_end_dt)"
    )


def render_replace_into_ods(
    tmp_table: str, ods_table: str, ods_schema: str = "ods"
) -> list[str]:
    """The reference's ``replace-into-ods`` publish swap (trgx.clj:188-193):
    drop the live ods table, move the freshly-built public.tmp table into
    the ods schema, rename it into place. Three statements, PostgreSQL
    schemas-as-namespaces semantics (Derby cannot move a table between
    schemas — this path is PG-only, tested against a real server).

    NOT crash-atomic on its own (neither was the reference — a failure
    between statements leaves no live table until re-run); for
    parquet/Delta sinks the engine's :func:`io.publish_atomic` is the
    crash-safe equivalent. JDBC callers publish through
    :func:`io.publish_replace_into_ods`, which runs these three statements
    in ONE transaction (:func:`io.jdbc_execute_transaction`) and closes
    that hole on PG.
    """
    return [
        f"SET search_path={ods_schema}; DROP TABLE IF EXISTS {ods_table} CASCADE",
        f"SET search_path=public; ALTER TABLE {tmp_table} SET SCHEMA {ods_schema}",
        f"SET search_path={ods_schema}; ALTER TABLE {tmp_table} RENAME TO {ods_table}",
    ]
