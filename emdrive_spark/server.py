"""HTTP SQL endpoint — the reference's query lifecycle entry points
(/root/reference/src/server/mod.rs:93-170):

- ``POST /`` with a SQL body → execute, JSON rows (NamedRow maps,
  encoding.rs:327-338).
- ``GET /?query=...`` → read-only: SELECT allowed, DDL/DML rejected
  (the reference's declared GET intent, server/mod.rs:66-91).
- per-request ULID id + µs timing header (server/mod.rs:97-99,132-136).

Errors return HTTP 400 with ``{"type": "syntax"|"validation",
"message": ...}`` (errors.rs:4-18). stdlib http.server — the front end
is deliberately thin; Spark's scheduler provides the concurrency the
reference got from its bounded mpsc channel (executor/mod.rs:19)."""

from __future__ import annotations

import json
import logging
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# Request log stream — the reference debug-logs a ULID per request at
# receipt and completion with µs elapsed (server/mod.rs:97-99,132-136).
# Same id also rides the X-Request-Id response header.
log = logging.getLogger("emdrive_spark.server")

from pyspark.sql import SparkSession

from emdrive_spark.config import Config
from emdrive_spark.engine import Engine
from emdrive_spark.functions.generators import ulid
from emdrive_spark.sql.errors import EmdriveError

DEFAULT_HOST = "127.0.0.1"
DEFAULT_PORT = 8824  # the reference's default (config.rs:14-22)


class ResultTooLarge(Exception):
    """A statement's result exceeds the configured HTTP row ceiling."""

    def __init__(self, cap: int):
        self.cap = cap
        super().__init__(
            f"Result exceeds the {cap}-row HTTP limit; add a LIMIT clause "
            "or raise EMDRIVE_MAX_RESULT_ROWS."
        )


def _rows_json(df, max_rows: int) -> str:
    if df is None:
        return json.dumps({"column_names": [], "rows": []})
    # The cap rides INSIDE the plan (limit -> CollectLimit), not as a
    # post-collect truncation: a no-LIMIT SELECT over a big table must
    # never materialize on the driver (r9 verdict item 4 — the
    # reference serializes everything, encoding.rs:327-338, which is
    # fine for its single-node page store and an OOM for ours). One
    # sentinel row past the cap distinguishes at-the-limit from over
    # it.
    if max_rows > 0:
        rows = df.limit(max_rows + 1).collect()
        if len(rows) > max_rows:
            raise ResultTooLarge(max_rows)
    else:  # cap disabled — reference-faithful unbounded collect
        rows = df.collect()
    return json.dumps(
        {"column_names": df.columns, "rows": [r.asDict(recursive=True) for r in rows]},
        default=str,
    )


def make_handler(engine: Engine, max_result_rows: int | None = None):
    cap = (
        max_result_rows
        if max_result_rows is not None
        else Config.from_env().max_result_rows
    )
    class Handler(BaseHTTPRequestHandler):
        # Connection timeout (StreamRequestHandler.setup applies it to
        # the socket): a client that promises more body bytes than it
        # sends would otherwise block rfile.read() forever — the same
        # thread-pinning hang as the negative-length case, from the
        # positive side (round-5 review). A stalled read now raises
        # TimeoutError → typed 408 below.
        timeout = 30
        # Statement-size ceiling; a Content-Length beyond it is
        # rejected up front (413) instead of buffering an arbitrary
        # body into memory.
        max_body_bytes = 16 * 1024 * 1024

        def _run(self, sql: str, read_only: bool) -> None:
            t0 = time.perf_counter_ns()
            request_id = ulid()
            log.debug("received request ID %s", request_id)
            try:
                # read-only is enforced PER STATEMENT inside the engine
                # (quote-aware split), so 'SELECT 1; INSERT ...' cannot
                # smuggle a mutation through GET; WITH/VALUES/TABLE query
                # forms are allowed, matching the ANSI passthrough.
                df = engine.execute_script(sql, read_only=read_only)
                body = _rows_json(df, cap)
                code = 200
            except EmdriveError as exc:
                body = json.dumps(exc.to_json())
                code = 400
            except ResultTooLarge as exc:
                # Same typed shape + 413 as the request-body ceiling:
                # resource limits are client-correctable, not server
                # faults.
                body = json.dumps({"type": "validation", "message": str(exc)})
                code = 413
            except Exception as exc:  # server-class error (errors.rs:28-34)
                # First line only (r4 review): a Py4J error's str() is a
                # full JVM stack trace with internal class names and
                # paths — never ship that to a client. Analysis errors
                # escaping the lazy plan (they surface at collect time)
                # are user-input problems → 400 validation, like the
                # engine's own eager wrapping.
                first = str(exc).strip().splitlines()[0] if str(exc).strip() else repr(exc)
                try:
                    from pyspark.errors import AnalysisException

                    is_analysis = isinstance(exc, AnalysisException)
                except ImportError:  # pragma: no cover
                    is_analysis = False
                if is_analysis:
                    body = json.dumps({"type": "validation", "message": first})
                    code = 400
                else:
                    body = json.dumps({"type": "server", "message": first})
                    code = 500
            elapsed_us = (time.perf_counter_ns() - t0) // 1000
            log.debug("finished request ID %s in %d µs", request_id, elapsed_us)
            self._respond(code, body, elapsed_us, request_id)

        def _respond(
            self, code: int, body: str, elapsed_us: int, request_id: str
        ) -> None:
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.send_header("X-Request-Id", request_id)
            self.send_header("X-Elapsed-Us", str(elapsed_us))
            self.end_headers()
            try:
                self.wfile.write(data)
            except (TimeoutError, BrokenPipeError, ConnectionResetError) as exc:
                # The class-level socket timeout applies to WRITES too:
                # a client slow to drain a large JSON result (or one
                # that hung up) would otherwise kill the handler thread
                # with an uncaught exception and no diagnostic (r5
                # advisor). Log it and let the connection close.
                log.warning(
                    "response write failed for request ID %s: %s",
                    request_id,
                    exc,
                )
                self.close_connection = True

        def do_POST(self):  # noqa: N802
            # Malformed framing (non-numeric Content-Length, non-UTF-8
            # body) must produce a typed 400, not an uncaught exception
            # that kills the handler thread and drops the connection
            # with no response at all (r4 review).
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length < 0:
                    # int('-5') parses fine and rfile.read(-5) reads
                    # until EOF — on a keep-alive socket that blocks
                    # the handler thread forever instead of answering
                    # (r4 advisor). Reject before touching the socket.
                    raise ValueError(f"negative Content-Length: {length}")
                if length > self.max_body_bytes:
                    body = json.dumps(
                        {
                            "type": "validation",
                            "message": f"Request body of {length} bytes exceeds "
                            f"the {self.max_body_bytes}-byte statement limit.",
                        }
                    )
                    self._respond(413, body, 0, ulid())
                    # The oversized body is never read off the socket;
                    # under HTTP/1.1 keep-alive its bytes would be
                    # parsed as the next request line (r5 advisor).
                    # Close instead of draining up to 16 MiB.
                    self.close_connection = True
                    return
                sql = self.rfile.read(length).decode()
            except TimeoutError:
                # Client sent fewer bytes than Content-Length promised
                # and went quiet; the socket timeout fired mid-read.
                body = json.dumps(
                    {"type": "validation", "message": "Request body read timed out."}
                )
                self._respond(408, body, 0, ulid())
                self.close_connection = True
                return
            except (ValueError, UnicodeDecodeError) as exc:
                body = json.dumps(
                    {"type": "validation", "message": f"Malformed request: {exc}"}
                )
                self._respond(400, body, 0, ulid())
                return
            self._run(sql, read_only=False)

        def do_GET(self):  # noqa: N802
            parsed = urllib.parse.urlparse(self.path)
            qs = urllib.parse.parse_qs(parsed.query)
            sql = (qs.get("query") or [""])[0]
            self._run(sql, read_only=True)

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def serve(
    spark: SparkSession | None = None,
    host: str | None = None,
    port: int | None = None,
    data_directory: str | None = None,
) -> ThreadingHTTPServer:
    """Start the endpoint (non-blocking; call ``.serve_forever()`` or
    drive it from a thread — tests do the latter).

    Unset arguments come from ``EMDRIVE_TCP_LISTEN_HOST`` /
    ``EMDRIVE_TCP_LISTEN_PORT`` / ``EMDRIVE_DATA_DIRECTORY`` with the
    reference's defaults (config.rs:40-48) — booting from env vars
    alone is the reference's whole launch story. If the data directory
    holds a saved catalog, it is restored before serving."""
    import os

    cfg = Config.from_env()
    host = host if host is not None else cfg.tcp_listen_host
    port = port if port is not None else cfg.tcp_listen_port
    # durability engages only when the data directory is EXPLICITLY
    # configured (argument or env var) — the built-in default
    # /var/lib/emdrive/data is an ops-provisioned path (config.rs:17)
    # that a dev/test environment typically cannot write.
    explicit = data_directory is not None or "EMDRIVE_DATA_DIRECTORY" in os.environ
    data_directory = data_directory if data_directory is not None else cfg.data_directory
    if spark is None:
        from emdrive_spark.session import get_spark

        spark = get_spark("emdrive-server")
    engine = Engine(spark, data_directory=data_directory if explicit else None)
    # Restore ONLY when durability is engaged (r4 review): restoring
    # from the implicit default path while _persist() is a no-op would
    # boot old data yet never save new inserts — the server would look
    # durable while silently reverting to the stale snapshot at every
    # restart.
    if explicit and os.path.exists(os.path.join(data_directory, "_catalog.json")):
        engine.catalog.restore(data_directory)
    httpd = _DrainingHTTPServer(
        (host, port), make_handler(engine, max_result_rows=cfg.max_result_rows)
    )
    httpd.engine = engine  # type: ignore[attr-defined]
    httpd.data_directory = data_directory  # type: ignore[attr-defined]
    return httpd


class _DrainingHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer that DRAINS on close: handler threads are
    non-daemon and ``server_close()`` joins them, so a SIGTERM during a
    long-running query lets the in-flight response complete before
    Spark stops — the reference's 'join server + executor' contract
    (src/server/mod.rs:140-145), not just stop-accepting."""

    daemon_threads = False
    block_on_close = True


def install_shutdown_handlers(server: ThreadingHTTPServer) -> None:
    """Trap SIGINT/SIGTERM and stop the accept loop cleanly — the
    reference's ctrl-c story (src/server/mod.rs:140-145: trap, then
    join server + executor). ``serve_forever`` returns once
    ``shutdown()`` is called; the caller then closes the socket (which
    drains in-flight handlers, see _DrainingHTTPServer) and stops
    Spark. ``shutdown()`` must not run on the serve_forever thread (it
    joins it), hence the helper thread."""
    import signal
    import threading

    def _on_signal(signum, frame):  # noqa: ARG001
        log.info("signal %d received — shutting down", signum)
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGINT, _on_signal)
    signal.signal(signal.SIGTERM, _on_signal)


if __name__ == "__main__":
    server = serve()
    install_shutdown_handlers(server)
    _host, _port = server.server_address[:2]
    print(f"emdrive-spark listening on http://{_host}:{_port}", flush=True)
    server.serve_forever()  # returns after shutdown() (signal handler)
    server.server_close()
    server.engine.spark.stop()  # type: ignore[attr-defined]
    print("emdrive-spark stopped cleanly", flush=True)
