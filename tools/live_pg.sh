#!/bin/sh
# Stand up the container's PostgreSQL 15 with logical WAL and run the
# live-Postgres integration suite (tests/test_live_pg.py) against it.
#
# The container ships server binaries but no wal2json.so (out-of-tree
# contrib), so the suite runs with the stock test_decoding plugin: the
# full wire path (startup, IDENTIFY_SYSTEM, slot lifecycle, CopyBoth,
# delivered-LSN confirmation, idle-timeout drain), live execution of
# the S10-S12/A4-A6/S2 SQL builders, and the end-to-end CDC loop
# (trigger -> audit log -> poll -> decode -> replay). Only the
# wal2json payload-decode test skips.
#
# Idempotent: re-running reuses a running server or restarts a stopped
# one. Data lives in /tmp/wp_pg (outside the repo, disposable).
set -e

PGDATA=/tmp/wp_pg/data
PORT=54329
DSN="postgresql://postgres@127.0.0.1:${PORT}/postgres"

if [ ! -d "$PGDATA" ]; then
    mkdir -p /tmp/wp_pg
    chown postgres:postgres /tmp/wp_pg
    runuser -u postgres -- initdb -D "$PGDATA" -A trust -U postgres
    cat >> "$PGDATA/postgresql.conf" <<EOF
wal_level = logical
max_wal_senders = 4
max_replication_slots = 4
max_prepared_transactions = 8
port = ${PORT}
listen_addresses = '127.0.0.1'
unix_socket_directories = '/tmp/wp_pg'
EOF
fi

# pre-round-11 data dirs lack max_prepared_transactions (needed by the
# pgoutput proto-v3 two-phase tests; restart-required GUC) — append and
# force a restart below
if ! grep -q '^max_prepared_transactions' "$PGDATA/postgresql.conf"; then
    echo 'max_prepared_transactions = 8' >> "$PGDATA/postgresql.conf"
    runuser -u postgres -- pg_ctl -D "$PGDATA" stop -m fast >/dev/null 2>&1 || true
fi

if ! runuser -u postgres -- pg_ctl -D "$PGDATA" status >/dev/null 2>&1; then
    runuser -u postgres -- pg_ctl -D "$PGDATA" -l /tmp/wp_pg/server.log start
fi

cd "$(dirname "$0")/.."
WP_LIVE_PG_DSN="$DSN" WP_LIVE_PG_PLUGIN=test_decoding \
    python -m pytest tests/test_live_pg.py -v "$@"
