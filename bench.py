"""Benchmark: GAN train-step throughput vs the PyTorch reference.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Primary metric: full unrolled-InfoGAN training steps/sec/chip at the
reference's default configuration (hidden 64, batch 256, 1 unrolling step,
info loss on — train.py:53-84).  One "step" = everything inside the
reference's per-chunk body: 2 discriminator updates (unroll), 1 generator
update, metrics.

``vs_baseline`` divides by the ACTUAL reference's measured steps/s:
/root/reference/train.py runs here (shimmed — time.clock and .cuda()
no-ops, nothing touching its math; see benchmarks/run_reference.py) on a
synthetic npz shaped exactly like this benchmark's config.  At h=64 the
reference is dispatch-bound, so its CPU-eager throughput is a close proxy
for its single-GPU throughput (BASELINE.md).  The social baseline still
uses the in-file eager-torch proxy: the reference hard-codes
use_social=False (train.py:83), so its social path cannot run unedited.
Measurements are cached in .bench_baseline.json.
"""

import json
import os
import sys
import time

import numpy as np

_BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".bench_baseline.json")

BATCH = 256
HIDDEN = 64
N_PAST, N_NEXT = 8, 12
N_SCENES = 32          # ~8 agents per scene, ETH/UCY-like


def _bench_ours(n_steps: int = 50):
    import jax
    import jax.numpy as jnp
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.engine import gan_step, init_train_state

    cfg = TrainConfig(hidden_size=HIDDEN, social_feature_size=HIDDEN,
                      noise_len=HIDDEN // 2, n_past=N_PAST, n_next=N_NEXT,
                      batch_size=BATCH, n_unrolling_steps=1,
                      use_info_loss=True, use_social=False)
    state = init_train_state(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    batch = {
        "obsvs": jnp.asarray(rng.rand(BATCH, N_PAST, 2).astype(np.float32)),
        "preds": jnp.asarray(rng.rand(BATCH, N_NEXT, 2).astype(np.float32)),
        "scene_ids": jnp.asarray(
            (np.arange(BATCH) % N_SCENES).astype(np.int32)),
        "valid": jnp.ones((BATCH,), bool),
    }

    import functools
    step = jax.jit(functools.partial(gan_step, cfg=cfg))

    # precompute keys: per-iteration fold_in dispatches flood the remote
    # tunnel; keys are not part of the measured step
    keys = [jax.random.PRNGKey(i) for i in range(n_steps)]
    jax.block_until_ready(keys)
    # warmup / compile
    state, _ = step(state, batch, keys[0])
    float(jnp.sum(state.g_params["embed"]["w"]))

    tic = time.perf_counter()
    for k in keys:
        state, m = step(state, batch, k)
    # force a host transfer: on remote-tunnel platforms (axon)
    # block_until_ready can return before execution finishes
    float(jnp.sum(state.g_params["embed"]["w"]))
    elapsed = time.perf_counter() - tic
    return n_steps / elapsed, jax.devices()[0].platform


def _bench_ours_scanned(n_steps: int = 2000, compute_dtype: str = "float32",
                        use_social: bool = False):
    """Device-side throughput: the trainer's production epoch-on-device
    mode (lax.scan over GAN steps) — no per-step host dispatch at all.
    The scan must be LONG (production fused-epochs blocks run thousands of
    steps): a short scan amortizes the tunnel's fixed ~30 ms result-fetch
    latency over too few steps and under-reports by ~2× (200-step scan:
    3.1k steps/s; 4000-step: 5.8k — matching the 165 µs/step the device
    trace shows).

    With ``use_social`` (sorted scene ids, as packing produces) this is the
    configuration where the reference pays its Python triple loop
    (train.py:160-175) per step."""
    import functools

    import jax
    import jax.numpy as jnp
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.engine import gan_step, init_train_state

    cfg = TrainConfig(hidden_size=HIDDEN, social_feature_size=HIDDEN,
                      noise_len=HIDDEN // 2, n_past=N_PAST, n_next=N_NEXT,
                      batch_size=BATCH, n_unrolling_steps=1,
                      use_info_loss=True, use_social=use_social,
                      compute_dtype=compute_dtype)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    ids = np.arange(BATCH) % N_SCENES
    if use_social:
        ids = np.sort(ids)
    batch = {
        "obsvs": jnp.asarray(rng.rand(BATCH, N_PAST, 2).astype(np.float32)),
        "preds": jnp.asarray(rng.rand(BATCH, N_NEXT, 2).astype(np.float32)),
        "scene_ids": jnp.asarray(ids.astype(np.int32)),
        "valid": jnp.ones((BATCH,), bool),
    }

    step = functools.partial(gan_step, cfg=cfg)

    @jax.jit
    def run(state, keys):
        def body(s, k):
            s2, m = step(s, batch, k)
            return s2, m.g_loss
        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(jax.random.PRNGKey(1), n_steps)
    state2, losses = run(state, keys)
    float(jnp.sum(losses))                 # compile + true sync
    best = float("inf")
    for _ in range(3):                     # best-of-3: the remote tunnel
        tic = time.perf_counter()          # adds run-to-run jitter
        state2, losses = run(state, keys)
        float(jnp.sum(losses))
        best = min(best, time.perf_counter() - tic)
    return n_steps / best


def _bench_rollout_agent_steps():
    """Secondary: K=20 stochastic rollout agent-steps/sec (eval workload).
    The repetition loop runs device-side (lax.scan) so the number is free
    of host-dispatch noise."""
    import jax
    import jax.numpy as jnp
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.eval.metrics import k_sample_rollout

    cfg = TrainConfig(hidden_size=HIDDEN, social_feature_size=HIDDEN,
                      noise_len=HIDDEN // 2, n_past=N_PAST, n_next=N_NEXT,
                      use_social=False)
    from socialways_tpu.models import init_generator
    params = init_generator(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    n, k, reps = 1024, 20, 20
    obsv = jnp.asarray(rng.rand(n, N_PAST, 2).astype(np.float32))
    ids = jnp.asarray((np.arange(n) % 64).astype(np.int32))

    @jax.jit
    def run(params, obsv, keys):
        def body(carry, kk):
            out = k_sample_rollout(params, carry, ids, kk, k, cfg)
            # serialize iterations without changing the workload
            return carry * (1.0 + 0.0 * out[0, 0, 0, 0]), out[0, 0, 0, 0]
        _, outs = jax.lax.scan(body, obsv, keys)
        return outs

    keys = jax.random.split(jax.random.PRNGKey(1), reps)
    outs = run(params, obsv, keys)
    float(jnp.sum(outs))                       # compile + true sync
    tic = time.perf_counter()
    outs = run(params, obsv, keys)
    float(jnp.sum(outs))
    elapsed = time.perf_counter() - tic
    return reps * k * n * N_NEXT / elapsed


def _bench_torch_reference(n_steps: int = 8, use_social: bool = False):
    """Faithful eager-PyTorch re-statement of the reference's train-step
    work (train.py:470-539: 4-D prep, (unroll+1)=2 D updates with LSGAN+info
    losses, 1 G update through a 12-step autoregressive decode), measured on
    this host as the baseline proxy.

    With ``use_social``, adds the reference's social path exactly as it
    computes it: eager full-batch pairwise feature matrices
    (train.py:229-241) + the per-scene per-agent Python attention loops
    (train.py:160-175), run inside every predict() call."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 8)
    h = HIDDEN

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Linear(4, h)
            self.lstm = nn.LSTM(h, h, batch_first=True)

    class Dec(nn.Module):
        def __init__(self):
            super().__init__()
            d = h + h + h // 2
            self.fc = nn.Sequential(
                nn.Linear(d, d), nn.LeakyReLU(0.2),
                nn.Linear(d, d // 2), nn.LeakyReLU(0.2),
                nn.Linear(d // 2, d // 4), nn.Linear(d // 4, 2))

    class Disc(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(4, h, batch_first=True)
            self.obsv_fc = nn.Sequential(nn.Linear(h, h // 2),
                                         nn.LeakyReLU(0.2),
                                         nn.Linear(h // 2, h // 2))
            self.pred_fc = nn.Sequential(nn.Linear(N_NEXT * 4, h // 2),
                                         nn.LeakyReLU(0.2),
                                         nn.Linear(h // 2, h // 2))
            self.cls = nn.Sequential(nn.Linear(h, h // 2), nn.LeakyReLU(0.2),
                                     nn.Linear(h // 2, 1))
            self.q = nn.Sequential(nn.Linear(h, h // 2), nn.LeakyReLU(0.2),
                                   nn.Linear(h // 2, 2))

        def forward(self, o, p):
            y, _ = self.lstm(o)
            both = torch.cat([self.obsv_fc(y[:, -1]),
                              self.pred_fc(p.reshape(p.shape[0], -1))], 1)
            return self.cls(both), self.q(both)

    class Emb(nn.Module):
        """EmbedSocialFeatures (train.py:178-189)."""
        def __init__(self):
            super().__init__()
            self.fc = nn.Sequential(nn.Linear(3, 32), nn.ReLU(),
                                    nn.Linear(32, 64), nn.ReLU(),
                                    nn.Linear(64, h))

        def forward(self, x):
            return self.fc(x)

    class Att(nn.Module):
        """AttentionPooling — the reference's per-scene per-agent Python
        loops (train.py:153-175), verbatim structure."""
        def __init__(self):
            super().__init__()
            self.W = nn.Linear(h, h)

        def forward(self, f, hh, sub_batches):
            Wh = self.W(hh)
            S = torch.zeros(hh.shape[0], h)
            for (s, e) in sub_batches:
                if e - s <= 1:
                    continue
                for i in range(s, e):
                    sigma = (f[i, s:e] * Wh[s:e]).sum(-1)
                    sigma = sigma.clone()
                    sigma[i - s] = -1000.0
                    a = torch.softmax(sigma, 0)
                    S[i] = (a.unsqueeze(1) * hh[s:e]).sum(0)
            return S

    def social_feats(x4):
        """SocialFeatures: eager full-batch pairwise matrices
        (train.py:229-241)."""
        p, v = x4[:, :2], x4[:, 2:]
        dp = p[:, None, :] - p[None, :, :]
        dv = v[:, None, :] - v[None, :, :]
        dist = dp.norm(dim=-1)
        bearing = (dp * v[:, None, :]).sum(-1) / (
            dist * v.norm(dim=-1)[:, None] + 1e-6)
        ttca = -(dp * dv).sum(-1) / ((dv * dv).sum(-1) + 1e-6)
        dca = (dp + ttca.unsqueeze(-1) * dv).norm(dim=-1)
        return torch.stack([dist, bearing, dca], -1)

    enc, dec, D = Enc(), Dec(), Disc()
    emb, att = Emb(), Att()
    sub_batches = [(i * (BATCH // N_SCENES), (i + 1) * (BATCH // N_SCENES))
                   for i in range(N_SCENES)]
    import itertools
    g_params = itertools.chain(
        enc.parameters(), dec.parameters(),
        *((emb.parameters(), att.parameters()) if use_social else ()))
    g_opt = torch.optim.Adam(g_params, lr=1e-4)
    d_opt = torch.optim.Adam(D.parameters(), lr=1e-3)
    mse = nn.MSELoss()

    obsv = torch.rand(BATCH, N_PAST, 2)
    pred = torch.rand(BATCH, N_NEXT, 2)

    def to4d(o, p):
        ov = o[:, 1:] - o[:, :-1]
        ov = torch.cat([ov[:, :1], ov], 1)
        o4 = torch.cat([o, ov], 2)
        pp = torch.cat([o[:, -1:], p[:, :-1]], 1)
        p4 = torch.cat([p, p - pp], 2)
        return o4, p4

    def predict(noise):
        o4, _ = to4d(obsv, pred)
        y, (hh, cc) = enc.lstm(enc.embed(o4))
        if use_social:
            # computed once from the last observed frame (train.py:408-413)
            s = att(emb(social_feats(o4[:, -1])), hh[0], sub_batches)
        else:
            s = torch.zeros(BATCH, h)
        last = obsv[:, -1]
        outs = []
        for _ in range(N_NEXT):
            z = torch.cat([hh[0], s, noise], 1)
            v = dec.fc(z)
            p = v + last
            s4 = torch.cat([p, v], 1)
            _, (hh, cc) = enc.lstm(enc.embed(s4).unsqueeze(1), (hh, cc))
            last = p
            outs.append(s4)
        return torch.stack(outs, 1)

    def one_step():
        o4, p4 = to4d(obsv, pred)
        noise = torch.rand(BATCH, h // 2)
        zeros = torch.zeros(BATCH, 1) + float(np.random.uniform(0, 0.1))
        ones = torch.ones(BATCH, 1) * float(np.random.uniform(0.9, 1.0))
        import copy
        backup = None
        for u in range(2):
            d_opt.zero_grad()
            with torch.no_grad():
                fake = predict(noise)
            fl, code = D(o4, fake)
            rl, _ = D(o4, p4)
            d_loss = mse(fl, zeros) + mse(rl, ones) + 0.5 * mse(
                code, noise[:, :2])
            d_loss.backward()
            d_opt.step()
            if u == 0:
                backup = copy.deepcopy(D)
        g_opt.zero_grad()
        fake = predict(noise)
        gl, code = D(o4, fake)
        g_loss = mse(gl, ones) + 0.5 * mse(code, noise[:, :2])
        g_loss.backward()
        g_opt.step()
        D.load_state_dict(backup.state_dict())

    one_step()  # warmup
    tic = time.perf_counter()
    for _ in range(n_steps):
        one_step()
    return n_steps / (time.perf_counter() - tic)


def _check_reference_fingerprint() -> None:
    """The reference tree is retrieved PUBLIC UNTRUSTED code that runs
    logic at import; refuse to execute it unless its content hash matches
    the pinned fingerprint (benchmarks/reference.sha256) recorded when the
    baseline protocol was established — a tampered checkout falls back to
    the in-file eager-torch proxy instead of silently running."""
    import hashlib
    ref_root = "/root/reference"
    pin_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "reference.sha256")
    with open(pin_file) as fh:
        pinned = fh.read().strip()
    outer = hashlib.sha256()
    paths = []
    for root, _, files in os.walk(ref_root):
        for f in files:
            if f.endswith(".py"):
                paths.append(os.path.join(root, f))
    for p in sorted(paths):
        with open(p, "rb") as fh:
            digest = hashlib.sha256(fh.read()).hexdigest()
        rel = "./" + os.path.relpath(p, ref_root)
        outer.update(f"{digest}  {rel}\n".encode())
    got = outer.hexdigest()
    if got != pinned:
        raise RuntimeError(
            f"reference tree fingerprint {got[:16]}… != pinned "
            f"{pinned[:16]}… — refusing to execute it")


def _run_real_reference() -> float:
    """Train the ACTUAL reference (/root/reference/train.py, shimmed, via
    benchmarks/run_reference.py) on the bench-shaped npz and return its
    measured steps/s — the ground-truth denominator for vs_baseline."""
    import subprocess
    _check_reference_fingerprint()
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "benchmarks", "run_reference.py"),
         "--epochs", "12"],
        capture_output=True, text=True, timeout=900, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])[
        "reference_steps_per_sec"]


def _merge_measurements(*histories) -> list:
    """Union dated measurement lists by (date, steps_per_sec), date-sorted.
    The conservative fastest-ever denominator only works if history
    survives sessions — a round-4 review found a fresh container silently
    degrading the ratio to same-day because history lived only in the
    gitignored cache and the committed record was overwritten wholesale."""
    seen, merged = set(), []
    for hist in histories:
        for m in hist or []:
            key = (m.get("date"), round(float(m["steps_per_sec"]), 3))
            if key not in seen:
                seen.add(key)
                merged.append(dict(m))
    merged.sort(key=lambda m: (str(m.get("date")), m["steps_per_sec"]))
    return merged


def _load_baseline_cache() -> dict:
    cache = {}
    if os.path.exists(_BASELINE_CACHE):
        with open(_BASELINE_CACHE) as fh:
            cache = json.load(fh)
    # migrate a legacy single-value cache to the dated-history schema (the
    # legacy value was measured when the baseline protocol was established)
    if ("reference_real_steps_per_sec" in cache
            and "reference_real_measurements" not in cache):
        cache["reference_real_measurements"] = [
            {"date": "2026-08-17",
             "steps_per_sec": cache["reference_real_steps_per_sec"]}]
    # Seed from the COMMITTED record: .bench_baseline.json is gitignored,
    # so a fresh container starts empty; without this the "fastest ever"
    # denominator collapses to whatever today happens to measure.
    if os.path.exists(_TPU_RECORD):
        try:
            with open(_TPU_RECORD) as fh:
                outer = json.load(fh)
            rec = outer.get("metrics", {})
        except (json.JSONDecodeError, OSError):
            outer, rec = {}, {}
        cache["reference_real_measurements"] = _merge_measurements(
            cache.get("reference_real_measurements"),
            rec.get("baseline_reference_measurements"))
        committed_social = rec.get("baseline_torch_social_proxy_measurements")
        if committed_social is None and rec.get(
                "baseline_torch_social_proxy_steps_per_sec"):
            committed_social = [{
                "date": outer.get("measured_at", "committed"),
                "steps_per_sec":
                    rec["baseline_torch_social_proxy_steps_per_sec"]}]
        session_social = cache.get("torch_eager_social_measurements")
        if session_social is None and cache.get(
                "torch_eager_social_steps_per_sec"):
            # legacy session scalar: date it by the cache file's mtime
            # (the session day it was written — "today" would be wrong
            # on a multi-day container) and round like every other
            # entry; skip entirely if the committed history already
            # carries the same value (it IS that measurement)
            import datetime
            val = round(cache["torch_eager_social_steps_per_sec"], 3)
            if any(m["steps_per_sec"] == val
                   for m in committed_social or []):
                session_social = []
            else:
                day = datetime.date.fromtimestamp(
                    os.path.getmtime(_BASELINE_CACHE)).isoformat()
                session_social = [{"date": day, "steps_per_sec": val}]
        merged_social = _merge_measurements(session_social, committed_social)
        if merged_social:
            cache["torch_eager_social_measurements"] = merged_social
    return cache


def _save_baseline_cache(cache: dict) -> None:
    with open(_BASELINE_CACHE, "w") as fh:
        json.dump(cache, fh)


def measure_reference_now(cache: dict):
    """Same-day re-measure of the ACTUAL reference on this host; appends a
    dated entry to the cache history and returns it (None on failure).

    The reference's wall speed drifts across container sessions (round 3
    measured 9.339 steps/s one day and 3.479 the next on the same code),
    so a single cached denominator makes the headline ratio ambiguous —
    every live bench run re-measures and reports BOTH the conservative
    (fastest-ever reference) and the same-day ratio, each dated."""
    import datetime
    try:
        sps = _run_real_reference()
    except Exception as e:
        print(f"same-day reference re-measure failed ({e})",
              file=sys.stderr)
        return None
    entry = {"date": datetime.date.today().isoformat(),
             "steps_per_sec": round(sps, 3)}
    hist = cache.setdefault("reference_real_measurements", [])
    hist.append(entry)
    _save_baseline_cache(cache)
    return entry


def get_reference_baseline(use_social: bool = False) -> float:
    """Non-social: the real reference's measured steps/s (the FASTEST
    dated measurement on record — the conservative denominator).  Social:
    the eager-torch proxy (the reference hard-codes use_social=False at
    train.py:83; its social path cannot be enabled without editing it)."""
    cache = _load_baseline_cache()
    if use_social:
        import datetime
        hist = cache.get("torch_eager_social_measurements", [])
        if not hist:
            sps = _bench_torch_reference(n_steps=4, use_social=True)
            hist = [{"date": datetime.date.today().isoformat(),
                     "steps_per_sec": round(sps, 3)}]
            cache["torch_eager_social_measurements"] = hist
            _save_baseline_cache(cache)
        # conservative = FASTEST proxy measurement ever recorded
        return max(m["steps_per_sec"] for m in hist)
    hist = cache.get("reference_real_measurements", [])
    if not hist:
        entry = measure_reference_now(cache)
        if entry is None:             # reference tree absent: proxy fallback
            print("using eager-torch proxy baseline", file=sys.stderr)
            hist = [{"date": "proxy",
                     "steps_per_sec": _bench_torch_reference(n_steps=8)}]
            cache["reference_real_measurements"] = hist
            _save_baseline_cache(cache)
        else:
            hist = cache["reference_real_measurements"]
    return max(m["steps_per_sec"] for m in hist)


def _wait_for_axon(max_wait_s: int = 900) -> bool:
    """Pre-flight for the axon TPU relay (the container's only device
    path).  A dead relay makes the first jax op HANG indefinitely (wall
    hours, ~0 CPU — see CLAUDE.md); probe the endpoint with a socket and
    wait bounded time for recovery.  Returns True when the relay answers,
    False after the deadline (caller degrades to the stale-record path)."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True                              # not tunneled (CPU/dev box)
    import socket
    import time
    deadline = time.time() + max_wait_s
    while True:
        try:
            with socket.create_connection(("127.0.0.1", 8083), timeout=5):
                return True
        except OSError:
            if time.time() > deadline:
                return False
            time.sleep(15)


_TPU_RECORD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "bench_tpu_record.json")


def _record_tpu_result(result: dict) -> None:
    """Persist a TPU-verified bench result (checked into benchmarks/) so a
    later tunnel outage can report the last real number instead of 0.

    Baseline histories are MERGED with the existing record, never
    overwritten: the committed record is the only cross-session store of
    the dated reference measurements that make vs_baseline conservative
    (round-4 regression: a wholesale overwrite destroyed the history and
    inflated the headline ratio)."""
    import datetime
    result = dict(result)
    prev = {}
    if os.path.exists(_TPU_RECORD):
        try:
            with open(_TPU_RECORD) as fh:
                prev = json.load(fh).get("metrics", {})
        except (json.JSONDecodeError, OSError):
            prev = {}
    merged = _merge_measurements(
        prev.get("baseline_reference_measurements"),
        result.get("baseline_reference_measurements"))
    if merged:
        result["baseline_reference_measurements"] = merged
        fastest = max(m["steps_per_sec"] for m in merged)
        result["baseline_reference_real_steps_per_sec"] = round(fastest, 3)
        if result.get("value"):
            result["vs_baseline"] = round(result["value"] / fastest, 2)
    merged_social = _merge_measurements(
        prev.get("baseline_torch_social_proxy_measurements"),
        result.get("baseline_torch_social_proxy_measurements"))
    if merged_social:
        result["baseline_torch_social_proxy_measurements"] = merged_social
        fastest_social = max(m["steps_per_sec"] for m in merged_social)
        result["baseline_torch_social_proxy_steps_per_sec"] = round(
            fastest_social, 3)
        if result.get("social_train_steps_per_sec"):
            result["social_vs_baseline"] = round(
                result["social_train_steps_per_sec"] / fastest_social, 2)
    with open(_TPU_RECORD, "w") as fh:
        json.dump({
            "measured_at": datetime.date.today().isoformat(),
            "platform": "tpu",
            "note": "last TPU-verified bench.py record; reported as a "
                    "clearly-labeled stale record when the axon relay is "
                    "down so an environmental outage never records a "
                    "bare 0",
            "metrics": result,
        }, fh, indent=2)
        fh.write("\n")


def _outage_fallback(wait_s: int) -> int:
    """Tunnel-down degraded mode: emit the last TPU-verified record (with
    its measurement date) plus a fresh clearly-labeled CPU-platform sanity
    number — self-describing and nonzero, never a bare 0 for an
    environmental outage."""
    err = (f"axon relay 127.0.0.1:8083 unreachable for {wait_s}s — TPU "
           f"tunnel down; reporting last TPU-verified record")
    record = None
    if os.path.exists(_TPU_RECORD):
        with open(_TPU_RECORD) as fh:
            record = json.load(fh)
    # CPU sanity run: forces the CPU backend (the axon plugin ignores the
    # JAX_PLATFORMS env var; the config update must precede backend use)
    cpu_sanity = None
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
        cpu_sanity = round(_bench_ours_scanned(n_steps=100), 2)
    except Exception as e:                       # sanity is best-effort
        print(f"cpu sanity run failed: {e}", file=sys.stderr)
    if record is None:
        print(json.dumps({
            "metric": "gan_train_steps_per_sec_per_chip",
            "value": 0, "unit": "steps/s", "vs_baseline": 0, "error": err,
            "cpu_sanity_epoch_on_device_steps_per_sec": cpu_sanity,
        }))
        return 1
    out = dict(record["metrics"])
    out.update({
        "stale": True,
        "stale_reason": err,
        "tpu_record_measured_at": record["measured_at"],
        "cpu_sanity_epoch_on_device_steps_per_sec": cpu_sanity,
        "cpu_sanity_note": "fresh run on this host's CPU backend (1 core);"
                           " NOT comparable to the TPU headline",
    })
    print(json.dumps(out))
    return 0


def main():
    wait_s = 900
    if not _wait_for_axon(wait_s):
        return _outage_fallback(wait_s)
    steps_per_sec, platform = _bench_ours()
    scanned_sps = _bench_ours_scanned()
    bf16_sps = _bench_ours_scanned(compute_dtype="bfloat16")
    social_sps = _bench_ours_scanned(n_steps=2000, use_social=True)
    agent_steps = _bench_rollout_agent_steps()
    # Same-day re-measure FIRST so the conservative "fastest ever" max
    # includes today's entry (and a fresh cache pays ONE reference run,
    # not two — round-4 review finding).
    cache = _load_baseline_cache()
    same_day = measure_reference_now(cache)      # dated re-measure, may fail
    baseline = get_reference_baseline()          # fastest dated measurement
    social_baseline = get_reference_baseline(use_social=True)
    best = max(steps_per_sec, scanned_sps, bf16_sps)
    cfg_tag = f"h{HIDDEN}-b{BATCH}-unroll1-info"
    if best == bf16_sps:
        cfg_tag += "-bf16"
    result = {
        "metric": "gan_train_steps_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "steps/s",
        # headline ratio = conservative: divided by the FASTEST reference
        # measurement ever recorded on this container (dated below); the
        # same-day ratio uses this run's own re-measure of the reference
        "vs_baseline": round(best / baseline, 2),
        "vs_baseline_same_day": (
            round(best / same_day["steps_per_sec"], 2) if same_day
            else None),
        "platform": platform,
        "config": cfg_tag,
        "dispatch_loop_steps_per_sec": round(steps_per_sec, 2),
        "epoch_on_device_steps_per_sec": round(scanned_sps, 2),
        "bf16_epoch_on_device_steps_per_sec": round(bf16_sps, 2),
        "social_train_steps_per_sec": round(social_sps, 2),
        "social_vs_baseline": round(social_sps / social_baseline, 2),
        "rollout_agent_steps_per_sec": round(agent_steps, 1),
        "baseline_reference_real_steps_per_sec": round(baseline, 3),
        "baseline_reference_same_day": same_day,
        "baseline_reference_measurements":
            cache.get("reference_real_measurements", []),
        "baseline_torch_social_proxy_steps_per_sec": round(social_baseline,
                                                           3),
        "baseline_torch_social_proxy_measurements":
            _load_baseline_cache().get("torch_eager_social_measurements",
                                       []),
    }
    if platform == "tpu":
        _record_tpu_result(result)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main() or 0)
