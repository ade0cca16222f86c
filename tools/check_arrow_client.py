#!/usr/bin/env python3
"""Wire-parity proof for the server's Arrow IPC surface, from OUTSIDE the JVM.

ServerSpec already decodes the `Accept: application/vnd.apache.arrow.stream`
response with the bundled Arrow Java reader; this script is the missing
half of the claim — a NON-JVM client (pyarrow) consuming the same bytes.
It POSTs one two-stage query twice (JSON response, then Arrow stream),
decodes the stream with `pyarrow.ipc.open_stream`, and row-compares the
two answers.

Usage:
  python3 tools/check_arrow_client.py [sf_dir]        # starts its own server
  GRAFT_URL=http://localhost:3333 python3 tools/check_arrow_client.py [sf_dir]

Without GRAFT_URL, launches `sbt runMain graft.Server` on an ephemeral
port (GRAFT_PORT=0) and parses the startup JSON line for the bound port.
Exits 0 on parity, 1 on any mismatch.
"""
import json
import os
import re
import subprocess
import sys
import time
import urllib.request

import pyarrow.ipc

ARROW_MIME = "application/vnd.apache.arrow.stream"


def query_json(sf_dir):
    return json.dumps({
        "steps": [
            {"sql": "SELECT r_regionkey, count(*) AS cnt FROM region "
                    "GROUP BY r_regionkey",
             "name": "m", "step_type": "HBee"},
            {"sql": "SELECT r_regionkey, cnt FROM m ORDER BY r_regionkey",
             "name": "r", "step_type": "HComb"},
        ],
        "capacity": {"zones": 1},
        "catalogs": [{"name": "region", "type": "Static",
                      "uri": f"{sf_dir}/region.parquet"}],
    }).encode()


def post(url, body, accept=None):
    req = urllib.request.Request(url, data=body, method="POST")
    if accept:
        req.add_header("Accept", accept)
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.headers.get("Content-Type"), resp.read()


def start_server(repo_root):
    env = dict(os.environ, GRAFT_PORT="0", SPARK_GRAFT_IDLE_SHUTDOWN_SEC="120")
    proc = subprocess.Popen(
        ["sbt", "-batch", "runMain graft.Server"],
        cwd=repo_root, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    deadline = time.time() + 300
    port = None
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        m = re.search(r'"server":"graft","port":(\d+)', line)
        if m:
            port = int(m.group(1))
            break
    if port is None:
        proc.terminate()
        raise RuntimeError("server did not start (no port line)")
    return proc, port


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.environ.get("GRAFT_URL")
    proc = None
    if base is None:
        proc, port = start_server(repo_root)
        base = f"http://localhost:{port}"
    try:
        body = query_json(sf_dir)
        # health first — the reference's HealthCheck reply
        with urllib.request.urlopen(f"{base}/health", timeout=60) as r:
            assert r.read() == b'"H"', "health check failed"

        _, json_bytes = post(f"{base}/query", body)
        json_rows = sorted(
            (int(r["r_regionkey"]), int(r["cnt"]))
            for r in json.loads(json_bytes))

        ctype, arrow_bytes = post(f"{base}/query", body, accept=ARROW_MIME)
        assert ctype == ARROW_MIME, f"wrong content type: {ctype}"
        table = pyarrow.ipc.open_stream(arrow_bytes).read_all()
        arrow_rows = sorted(
            zip((int(v) for v in table.column("r_regionkey").to_pylist()),
                (int(v) for v in table.column("cnt").to_pylist())))

        assert table.num_rows == len(json_rows) > 0, \
            f"row counts differ: arrow={table.num_rows} json={len(json_rows)}"
        assert arrow_rows == json_rows, \
            f"row values differ:\n arrow={arrow_rows}\n json={json_rows}"
        print(f"ARROW WIRE PARITY OK: {table.num_rows} rows, "
              f"schema={table.schema.names}, decoded by pyarrow "
              f"{pyarrow.__version__}")
        return 0
    finally:
        if proc is not None:
            proc.terminate()


if __name__ == "__main__":
    sys.exit(main())
