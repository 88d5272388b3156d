"""In-process test double for the ClickHouse HTTP interface.

Speaks the public wire format the real server speaks — POST body (or
URL-query) SQL, ``X-ClickHouse-User``/``X-ClickHouse-Key`` auth,
``FORMAT JSONCompact`` schema probes, ``FORMAT JSONEachRow`` data and
INSERT bodies — and executes the received SQL in DuckDB over the
fixture parquet, so every byte of the connector path
(sources/ch_http.py: per-task executor-side fetches, schema probe,
INSERT sink, TRUNCATE) runs against a live socket; only ClickHouse's
own SQL engine is substituted. Used by tests/test_ch_http.py and by
the declared wire-proof query (x42_http_parallel_extract) — the same
role the embedded Derby plays for the JDBC path (x28/x32).

This is development/CI scaffolding, not a production component: point
the connector at a real server by swapping host/port.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

STUB_USER, STUB_KEY = "graft", "s3cret"


def make_handler(sf_dir: str, query_log: list[str], store: dict | None = None):
    """Request handler bound to a fixture dir: auth-checks, logs every
    SQL, executes SELECTs in DuckDB over the parquet views, applies
    INSERT/TRUNCATE to the in-memory ``store``."""
    import duckdb

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            if (
                self.headers.get("X-ClickHouse-User") != STUB_USER
                or self.headers.get("X-ClickHouse-Key") != STUB_KEY
            ):
                self.send_response(401)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            body_bytes = self.rfile.read(n)
            # INSERT protocol: the query rides the URL, the body is data
            from urllib.parse import parse_qs, urlparse

            url_q = parse_qs(urlparse(self.path).query).get("query", [""])[0]
            m = re.match(
                r"INSERT\s+INTO\s+(\w+)\s+FORMAT\s+JSONEachRow",
                url_q,
                re.IGNORECASE,
            )
            if m:
                query_log.append(url_q)
                tbl = m.group(1)
                rows = [
                    json.loads(line)
                    for line in body_bytes.decode("utf-8").splitlines()
                    if line.strip()
                ]
                (store if store is not None else {}).setdefault(
                    tbl, []
                ).extend(rows)
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            sql = body_bytes.decode("utf-8").strip()
            query_log.append(sql)
            tm = re.match(r"TRUNCATE\s+TABLE\s+(\w+)", sql, re.IGNORECASE)
            if tm:
                (store if store is not None else {}).pop(tm.group(1), None)
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            fmt = "TSV"
            for f in ("JSONCompact", "JSONEachRow"):
                if sql.endswith(f"FORMAT {f}"):
                    fmt = f
                    sql = sql[: -len(f"FORMAT {f}")].strip()
            con = duckdb.connect()
            for t in ("events", "nation", "orders"):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
            if store:
                import pandas as _pd

                for t, rows_ in store.items():
                    con.register(t, _pd.DataFrame(rows_))
            try:
                cur = con.sql(sql)
                cols = cur.columns
                types = [str(t) for t in cur.types]
                rows = cur.fetchall()
            except Exception as e:  # pragma: no cover
                self.send_response(500)
                self.end_headers()
                self.wfile.write(str(e).encode())
                return
            if fmt == "JSONCompact":
                body = json.dumps(
                    {
                        "meta": [
                            {"name": c, "type": t}
                            for c, t in zip(cols, types)
                        ],
                        "data": [list(map(str, r)) for r in rows],
                    }
                ).encode()
            else:
                body = "\n".join(
                    json.dumps(dict(zip(cols, r)), default=str) for r in rows
                ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def start_stub(
    sf_dir: str,
    query_log: list[str] | None = None,
    store: dict | None = None,
) -> tuple[ThreadingHTTPServer, int, list[str]]:
    """Start the double on an ephemeral port (daemon thread); returns
    (server, port, query_log). Caller shuts down via server.shutdown()
    or leaves the daemon to die with the process."""
    log = query_log if query_log is not None else []
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(sf_dir, log, store)
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1], log
