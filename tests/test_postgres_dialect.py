"""Real-Postgres validation of the JDBC sink's pg dialect surface.

The transactional sink is proven end-to-end over a real JDBC wire against
embedded Derby (test_jdbc_sink.py, stream_ingest_jdbc_e2e) — but Derby
leaves three Postgres-dialect deltas unproven (COVERAGE.md "JDBC dialect
parity"): case-preserving identifier quoting, the `options=-c
statement_timeout=…` startup parameter `build_jdbc_url` emits
(reference index.js:1081-1096), and ledger/rollback behavior under pg
transaction semantics. The sandbox has no pg JDBC jar, but it DOES ship
PostgreSQL 15 server binaries + psql — so these tests boot a scratch
server on a unix socket and execute the sink's OWN generated statement
sequence (`sinks.build_swap_statements` — the same list `_write_jdbc`
runs) over the real wire via psql's single-transaction mode, which is
exactly the `begin; …; commit/rollback` wrapper `_run_jdbc_statements`
implements in JDBC.

Gated: skips when the server can't be provisioned (no binaries, or no
way to run as an unprivileged user).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import uuid

import pytest

from aws_lambda_redshift_loader_spark.sources.routing import ClusterSink
from aws_lambda_redshift_loader_spark.streaming.sinks import (
    build_jdbc_url,
    build_swap_statements,
)

INITDB = shutil.which("initdb") or "/usr/local/bin/initdb"
PG_CTL = shutil.which("pg_ctl") or "/usr/local/bin/pg_ctl"
PSQL = shutil.which("psql")


def _provision():
    """initdb + pg_ctl start on a unix socket; returns (sockdir, datadir)
    or None. Root can't run postgres directly — re-run the server-side
    steps as the `postgres` system user when needed."""
    if not (PSQL and os.path.exists(INITDB) and os.path.exists(PG_CTL)):
        return None
    tag = uuid.uuid4().hex[:8]
    data = f"/tmp/alrs_pg_{tag}/data"
    sock = f"/tmp/alrs_pg_{tag}/sock"
    os.makedirs(data, exist_ok=True)
    os.makedirs(sock, exist_ok=True)

    def sh(cmd: str) -> subprocess.CompletedProcess:
        if os.geteuid() == 0:
            shutil.chown(data, user="postgres")
            shutil.chown(sock, user="postgres")
            return subprocess.run(
                ["su", "postgres", "-s", "/bin/sh", "-c", cmd],
                capture_output=True, text=True, timeout=60,
            )
        return subprocess.run(
            ["/bin/sh", "-c", cmd], capture_output=True, text=True, timeout=60
        )

    try:
        r = sh(f"{INITDB} -D {data} -U alrs --no-sync -A trust")
        if r.returncode != 0:
            return None
        r = sh(
            f"{PG_CTL} -D {data} -o \"-c listen_addresses='' "
            f"-c unix_socket_directories={sock}\" -l {data}/server.log -w start"
        )
        if r.returncode != 0:
            return None
    except Exception:
        return None
    return sock, data


@pytest.fixture(scope="module")
def pg():
    prov = _provision()
    if prov is None:
        pytest.skip("no provisionable PostgreSQL server in this environment")
    sock, data = prov
    yield sock
    cmd = f"{PG_CTL} -D {data} -m immediate -w stop"
    if os.geteuid() == 0:
        subprocess.run(["su", "postgres", "-s", "/bin/sh", "-c", cmd],
                       capture_output=True, timeout=60)
    else:
        subprocess.run(["/bin/sh", "-c", cmd], capture_output=True, timeout=60)
    shutil.rmtree(os.path.dirname(data), ignore_errors=True)


def _psql(sock: str, sql: str, options: str | None = None, single_txn: bool = False):
    conninfo = f"host={sock} user=alrs dbname=postgres"
    if options:
        conninfo += f" options='{options}'"
    args = [PSQL, conninfo, "-v", "ON_ERROR_STOP=1", "-qAtX"]
    if single_txn:
        args.append("-1")
    return subprocess.run(args, input=sql, capture_output=True, text=True, timeout=60)


def _jdbc_options_param(url: str) -> str:
    """Extract the `options` startup parameter build_jdbc_url emits; its
    VALUE is a libpq options string, so psql validates the same thing
    the pg JDBC driver would send at startup."""
    query = url.split("?", 1)[1]
    for kv in query.split("&"):
        k, _, v = kv.partition("=")
        if k == "options":
            return v
    raise AssertionError(f"no options param in {url}")


def test_statement_timeout_startup_option(pg):
    url = build_jdbc_url("h", 5439, "db", ssl=False, statement_timeout_ms=250)
    opts = _jdbc_options_param(url)
    assert opts == "-c statement_timeout=250"
    # The session really inherits the timeout...
    r = _psql(pg, "SHOW statement_timeout;", options=opts)
    assert r.returncode == 0 and r.stdout.strip() == "250ms", r.stderr
    # ...and it really cancels statements (SQLSTATE 57014), which is the
    # reference's per-COPY timeout behavior (index.js:1081-1096).
    r = _psql(pg, "SELECT pg_sleep(2);", options=opts)
    assert r.returncode != 0
    assert "statement timeout" in r.stderr


def test_quoted_identifier_swap_roundtrip(pg):
    """Spark's JDBC writer creates case-preserved quoted columns; Derby
    resolves unquoted names by UPPERCASING, Postgres by lowercasing —
    the sink quotes everywhere, which must work on the pg dialect too."""
    r = _psql(
        pg,
        'CREATE TABLE tgt_events ("eventId" BIGINT, "eventType" TEXT);'
        'CREATE TABLE stage_ev ("eventId" BIGINT, "eventType" TEXT);'
        "INSERT INTO stage_ev VALUES (1, 'click'), (2, 'view');",
    )
    assert r.returncode == 0, r.stderr
    sink = ClusterSink(target_table="tgt_events", jdbc_url="unused")
    stmts = build_swap_statements(["eventId", "eventType"], sink, "stage_ev")
    r = _psql(pg, ";\n".join(stmts) + ";", single_txn=True)
    assert r.returncode == 0, r.stderr
    r = _psql(pg, 'SELECT COUNT(*), MIN("eventId") FROM tgt_events;')
    assert r.stdout.strip() == "2|1"
    # Unquoted mixed-case access must FAIL on pg (it lowercases) — the
    # quoting isn't decorative; dropping it would break this dialect.
    r = _psql(pg, "SELECT eventId FROM tgt_events;")
    assert r.returncode != 0


def test_swap_rolls_back_atomically(pg):
    """A failing postsql aborts the WHOLE swap: target untouched, ledger
    row absent — the all-or-nothing batch contract (index.js:909-925)
    under real pg transaction semantics."""
    r = _psql(
        pg,
        'CREATE TABLE tgt_rb ("v" BIGINT);'
        'CREATE TABLE tgt_rb_epochs (epoch BIGINT PRIMARY KEY);'
        'CREATE TABLE stage_rb ("v" BIGINT);'
        "INSERT INTO tgt_rb VALUES (42);"
        "INSERT INTO stage_rb VALUES (7);",
    )
    assert r.returncode == 0, r.stderr
    sink = ClusterSink(
        target_table="tgt_rb", jdbc_url="unused",
        truncate_target=True, postsql="SELECT 1/0;",
    )
    stmts = build_swap_statements(["v"], sink, "stage_rb", epoch_id=5)
    r = _psql(pg, ";\n".join(stmts) + ";", single_txn=True)
    assert r.returncode != 0  # postsql blew up
    r = _psql(
        pg,
        'SELECT (SELECT COUNT(*) FROM tgt_rb), (SELECT MIN("v") FROM tgt_rb),'
        " (SELECT COUNT(*) FROM tgt_rb_epochs);",
    )
    assert r.stdout.strip() == "1|42|0", r.stdout  # delete+insert+ledger all undone


def test_epoch_ledger_primary_key_is_a_cas(pg):
    """Exactly-once under replay does not depend on the driver-side
    ledger pre-check: if a replayed epoch races past it, the ledger
    INSERT (same transaction as the data) hits the PRIMARY KEY and the
    whole duplicate load rolls back — the reference's batch-status
    conditional-update (index.js:693-757) expressed as a constraint."""
    r = _psql(
        pg,
        'CREATE TABLE tgt_cas ("v" BIGINT);'
        'CREATE TABLE tgt_cas_epochs (epoch BIGINT PRIMARY KEY);'
        'CREATE TABLE stage_cas ("v" BIGINT);'
        "INSERT INTO stage_cas VALUES (7);",
    )
    assert r.returncode == 0, r.stderr
    sink = ClusterSink(target_table="tgt_cas", jdbc_url="unused")
    stmts = build_swap_statements(["v"], sink, "stage_cas", epoch_id=9)
    r = _psql(pg, ";\n".join(stmts) + ";", single_txn=True)
    assert r.returncode == 0, r.stderr
    # Replay the identical swap: PK violation → duplicate rows rolled back.
    r = _psql(pg, ";\n".join(stmts) + ";", single_txn=True)
    assert r.returncode != 0
    assert "tgt_cas_epochs_pkey" in r.stderr
    r = _psql(pg, "SELECT COUNT(*) FROM tgt_cas;")
    assert r.stdout.strip() == "1"
