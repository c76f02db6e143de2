"""Request-latency profile of the HTTP serving host (VERDICT round-2
item 6): p50/p99 latency and QPS through ``tpurec.server`` under
concurrent clients at request sizes 1 / 512 / 4096 rows.

Flagship shapes (MMoE + aux attention, 1.37M-row itemid vocab).  The
server is started in-process on an ephemeral port; clients are threads
issuing sequential POST /predict requests.  Numbers include JSON
(de)serialization, the scoring lock, and — on this image — the remote-TPU
tunnel's ~26ms dispatch RTT, which dominates small-request latency and
would be absent on a PCIe-attached host; a direct (no-HTTP) predictor
call latency is printed alongside to separate the layers.

Prints one JSON line per (request_rows, n_clients) config.

Usage: python scripts/bench_serve_latency.py [--requests 40]
"""

import argparse
import http.client
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIELD_DIMS = (
    250000, 10, 10, 10, 10, 10, 10, 10, 10,
    1368287,
    50,
    5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4,
)
DOMAIN_IDX = 10
N_TOWER = 4


def client_worker(port, payload, n_requests, lat_out, idx):
    lats = []
    conn = http.client.HTTPConnection("127.0.0.1", port)
    for _ in range(n_requests):
        t0 = time.perf_counter()
        conn.request("POST", "/predict", payload,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = resp.read()
        lats.append((time.perf_counter() - t0) * 1e3)
        assert resp.status == 200, body[:200]
    conn.close()
    lat_out[idx] = lats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=40,
                    help="requests per client per config")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpurec.config import Config, ModelConfig, TrainConfig
    from tpurec.serve import Predictor
    from tpurec.server import make_server

    cfg = Config(
        model=ModelConfig(
            model="mmoe", embed_dim=16,
            mmoe_expert_dims=(256, 128, 64), mmoe_tower_dims=(64, 32),
            use_atten=True, atten_embed_dim=64, att_layer_num=3,
            att_head_num=2),
        train=TrainConfig(bs=512),
    )
    d2g = (np.arange(50) % N_TOWER).astype(np.int32)
    sizes = (1, 512, 4096)
    pred = Predictor(cfg, FIELD_DIMS, 50, DOMAIN_IDX, domain2group=d2g,
                     batch_sizes=sizes)
    variables = jax.jit(pred.model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, len(FIELD_DIMS)), jnp.int32),
        group=jnp.zeros((2,), jnp.int32))
    pred.load_variables(
        variables["params"],
        {k: v for k, v in variables.items() if k != "params"})
    pred.warm()

    rng = np.random.default_rng(0)

    def make_rows(n):
        return np.stack(
            [rng.integers(0, d, size=n) for d in FIELD_DIMS], axis=1)

    # direct-call latency (no HTTP): separates tunnel+compute from host
    for n in sizes:
        X = make_rows(n)
        pred(X)  # warm the exact shape path
        lats = []
        for _ in range(max(10, args.requests // 2)):
            t0 = time.perf_counter()
            pred(X)
            lats.append((time.perf_counter() - t0) * 1e3)
        print(json.dumps({
            "metric": f"predictor_direct_latency_ms[rows={n}]",
            "p50": round(float(np.percentile(lats, 50)), 2),
            "p99": round(float(np.percentile(lats, 99)), 2),
        }), flush=True)

    srv = make_server(pred, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    for n in sizes:
        payload = json.dumps(
            {"instances": make_rows(n).tolist()}).encode()
        for n_clients in (1, 4, 8):
            lat_out = [None] * n_clients
            threads = [
                threading.Thread(target=client_worker,
                                 args=(port, payload, args.requests,
                                       lat_out, i))
                for i in range(n_clients)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            lats = np.concatenate(lat_out)
            total_req = n_clients * args.requests
            print(json.dumps({
                "metric": f"serve_http_latency_ms[rows={n},clients={n_clients}]",
                "p50": round(float(np.percentile(lats, 50)), 2),
                "p99": round(float(np.percentile(lats, 99)), 2),
                "qps": round(total_req / wall, 1),
                "rows_per_sec": round(total_req * n / wall, 1),
            }), flush=True)
    srv.shutdown()


if __name__ == "__main__":
    main()
