"""Measured serve concurrency envelope for docs/PERF.md.

The lock design (one device, per-request serialization for /mix|/gains,
lock-free streaming pushes) is covered functionally by
tests/test_serve.py::TestConcurrencyEnvelope; this script produces the
NUMBERS row: unloaded /gains latency, p50/p99 under N concurrent clients,
aggregate QPS at the single-device serialization ceiling, and live /stream
push latency while the locked mixes queue.

Run on an IDLE host (CLAUDE.md: concurrent work depresses both the link
rate and host packing):

    timeout 1800 python benchmarks/serve_envelope.py [song_seconds] [n_clients]

Reference context: the reference has no serving layer at all (SURVEY.md
S2/S5 — notebooks only); this measures the tpumix addition at its real
surface.
"""

from __future__ import annotations

import http.client
import json
import sys
import threading
import time

import numpy as np

SR = 44100


def _percentiles(xs):
    xs = sorted(xs)
    p50 = xs[len(xs) // 2]
    p99 = xs[min(len(xs) - 1, int(round(0.99 * (len(xs) - 1))))]
    return p50, p99


def main() -> None:
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    n_clients = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = 3

    from tpumix.cli import _load_variables
    from tpumix.config import ModelConfig
    from tpumix.infer.mixer import SongMixer
    from tpumix.models.registry import build_model
    from tpumix.serve import STEMS, encode_stems_wav, serve

    cfg = ModelConfig(name="scalar2s", chunk_length_s=2.0, hop_length=512)
    model = build_model(cfg)
    variables = _load_variables("scalar2s_lstsq_selfsup")
    mixer = SongMixer(model, variables, cfg, transfer_dtype="int16")
    httpd = serve(mixer, host="127.0.0.1", port=0, model_name="scalar2s")
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    print("[envelope] warming device programs...", file=sys.stderr, flush=True)
    httpd.service.warm()
    host, port = httpd.server_address

    # distinct body per (client, rep): the runtime memoizes identical
    # executions (CLAUDE.md), so repeated content would fake the numbers
    rng = np.random.default_rng(0)
    n = int(dur * SR)
    base = {s: (0.1 * rng.standard_normal((2, n))).astype(np.float32) for s in STEMS}
    print(f"[envelope] encoding {n_clients * reps} distinct {dur:.0f}s bodies...",
          file=sys.stderr, flush=True)
    bodies = []
    for k in range(n_clients * reps):
        rolled = {s: np.roll(x, 9973 * (k + 1), axis=1) for s, x in base.items()}
        bodies.append(encode_stems_wav(rolled))
    body_mb = len(bodies[0]) / 1e6

    def gains_once(body):
        conn = http.client.HTTPConnection(host, port, timeout=600)
        tic = time.monotonic()
        conn.request("POST", "/gains", body=body,
                     headers={"Content-Length": str(len(body))})
        r = conn.getresponse()
        payload = r.read()
        dt = time.monotonic() - tic
        conn.close()
        assert r.status == 200, payload[:200]
        return dt

    # unloaded latency (sequential, distinct content per rep)
    unloaded = [gains_once(bodies[k]) for k in range(min(3, len(bodies)))]
    print(f"[envelope] unloaded /gains: {['%.2f' % x for x in unloaded]} s",
          file=sys.stderr, flush=True)

    # live stream on its own connection, started before the load
    conn = http.client.HTTPConnection(host, port, timeout=600)
    conn.putrequest("POST", "/stream")
    conn.putheader("Transfer-Encoding", "chunked")
    conn.endheaders()
    C = mixer.chunk_samples
    block = (0.2 * rng.standard_normal((len(STEMS), C))).astype("<f4")

    def send_block(b):
        raw = b.tobytes()
        conn.send(f"{len(raw):x}\r\n".encode() + raw + b"\r\n")

    def read_block(fp):
        out = b""
        while len(out) < C * 4:
            size = int(fp.readline().strip(), 16)
            assert size > 0
            got = b""
            while len(got) < size:
                got += fp.read(size - len(got))
            fp.read(2)
            out += got

    send_block(block)
    resp = conn.response_class(conn.sock, method="POST")
    resp.begin()
    assert resp.status == 200
    fp = resp.fp
    read_block(fp)  # first push answered before load starts

    # N concurrent clients x reps sequential requests each
    lat, errors = [], []
    lat_lock = threading.Lock()

    def client(ci):
        for r in range(reps):
            try:
                dt = gains_once(bodies[ci * reps + r])
                with lat_lock:
                    lat.append(dt)
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))

    tic = time.monotonic()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    # interleave stream pushes while the locked mixes queue
    push_lat = []
    stream_done = threading.Event()

    def pusher():
        i = 0
        while not stream_done.is_set():
            i += 1
            t0 = time.monotonic()
            send_block(np.roll(block, 131 * i, axis=1))
            read_block(fp)
            push_lat.append(time.monotonic() - t0)
            time.sleep(0.2)

    pt = threading.Thread(target=pusher)
    pt.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - tic
    stream_done.set()
    pt.join()
    conn.send(b"0\r\n\r\n")
    httpd.shutdown()

    assert not errors, errors
    p50, p99 = _percentiles(lat)
    sp50, sp99 = _percentiles(push_lat) if push_lat else (float("nan"),) * 2
    result = {
        "song_s": dur,
        "n_clients": n_clients,
        "requests": len(lat),
        "body_mb": round(body_mb, 1),
        "unloaded_p50_s": round(_percentiles(unloaded)[0], 2),
        "loaded_p50_s": round(p50, 2),
        "loaded_p99_s": round(p99, 2),
        "qps": round(len(lat) / wall, 3),
        "audio_s_per_s": round(len(lat) * dur / wall, 1),
        "stream_pushes": len(push_lat),
        "stream_push_p50_s": round(sp50, 2),
        "stream_push_p99_s": round(sp99, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
