"""Synthetic ETH/UCY-like scenes in obsmat format + LOO fold construction.

Real ETH/UCY obsmat files are not in this container (zero egress), so the
leave-one-out protocol is validated on realistic synthetic crowd scenes
instead: pedestrians crossing per-scene walkable areas with goal-directed
motion, per-scene geometry/speed character, walking-pair correlation and
observation noise, exported as BIWI ``obsmat.txt`` rows
``(ts id px pz py vx vz vy)`` — positions in columns 2/4, velocities 5/7
(reference utils/parse_utils.py:231-320).  The moment real data appears the
same pipeline runs unchanged on it (ROADMAP §2).

Scenes are windowed through the SAME ``create_dataset`` path as real data
and trimmed to a common scene-batch count B so that every LOO fold's merged
npz has the held-out scene as exactly the last 1/5 of scene batches — which
makes the reference's hard-coded ``train_size = len(batches)*4//5`` split
(train.py:95-98) coincide exactly with the scene boundary, letting the
UNMODIFIED reference train each fold.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

SCENES = ("eth", "hotel", "univ", "zara1", "zara2")

# per-scene character: walkable box (m), mean speed (m/s), flow style
_SCENE_STYLE = {
    "eth":   dict(box=(14.0, 11.0), speed=1.40, cross=0.25, wobble=0.15),
    "hotel": dict(box=(12.0, 9.0),  speed=1.15, cross=0.45, wobble=0.25),
    "univ":  dict(box=(15.0, 13.0), speed=1.05, cross=0.50, wobble=0.35),
    "zara1": dict(box=(13.0, 10.0), speed=1.30, cross=0.30, wobble=0.20),
    "zara2": dict(box=(13.0, 10.0), speed=1.20, cross=0.40, wobble=0.30),
}
FRAME_INTERVAL = 10       # obsmat frame stride (2.5 fps annotations)
DT = 0.4                  # seconds per annotated step


def _edge_point(rng, box, edge):
    w, hgt = box
    u = rng.uniform(0.15, 0.85)
    return {
        0: np.array([u * w, 0.0]),
        1: np.array([u * w, hgt]),
        2: np.array([0.0, u * hgt]),
        3: np.array([w, u * hgt]),
    }[edge]


def make_scene(scene: str, n_agents: int = 110, seed: int = 0
               ) -> List[Tuple[int, int, np.ndarray, np.ndarray]]:
    """Simulate one scene; returns [(agent_id, t0_frame, pos [L,2],
    vel [L,2])] with L in [22, 30] steps."""
    style = _SCENE_STYLE[scene]
    rng = np.random.RandomState(seed + hash(scene) % 10000)
    box = np.asarray(style["box"])
    agents = []
    aid = 1
    t_cursor = 0
    while len(agents) < n_agents:
        # Poisson-ish arrivals: 0-2 new walkers every other frame
        n_new = rng.poisson(0.9)
        for _ in range(n_new):
            main_edge = rng.randint(4)
            src = _edge_point(rng, box, main_edge)
            if rng.rand() < style["cross"]:
                dst_edge = (main_edge + rng.choice([2, 3])) % 4
            else:
                dst_edge = main_edge ^ 1          # opposite edge
            dst = _edge_point(rng, box, dst_edge)
            L = int(rng.randint(22, 31))
            speed = style["speed"] * rng.uniform(0.8, 1.2)
            d = dst - src
            need = speed * DT * (L - 1)
            dst = src + d / (np.linalg.norm(d) + 1e-9) * need
            tt = np.linspace(0.0, 1.0, L)[:, None]
            path = src[None] + tt * (dst - src)[None]
            # gentle curvature + gait wobble + observation noise
            normal = np.array([-(dst - src)[1], (dst - src)[0]])
            normal /= (np.linalg.norm(normal) + 1e-9)
            curve = np.sin(tt * np.pi) * rng.uniform(-1, 1) * style["wobble"]
            path = path + curve * normal[None]
            path = path + rng.randn(L, 2) * 0.02
            group = [(aid, t_cursor, path)]
            aid += 1
            if rng.rand() < 0.25:                 # walking pair
                off = normal * rng.uniform(0.5, 0.9)
                group.append((aid, t_cursor,
                              path + off[None] + rng.randn(L, 2) * 0.02))
                aid += 1
            for gid, gt0, gpath in group:
                vel = np.gradient(gpath, DT, axis=0)
                agents.append((gid, gt0, gpath.astype(np.float64),
                               vel.astype(np.float64)))
        t_cursor += 2
    return agents[:n_agents]


def write_obsmat(agents, path: str) -> None:
    rows = []
    for aid, t0, pos, vel in agents:
        for k in range(pos.shape[0]):
            ts = (t0 + k) * FRAME_INTERVAL
            rows.append((ts, aid, pos[k, 0], 0.0, pos[k, 1],
                         vel[k, 0], 0.0, vel[k, 1]))
    rows.sort(key=lambda r: (r[0], r[1]))
    with open(path, "w") as fh:
        for r in rows:
            fh.write(" ".join(f"{v:.6f}" for v in r) + "\n")


def scene_npz(obsmat: str, out: str, n_past: int = 8, n_next: int = 12,
              trim_batches: int = 0) -> int:
    """obsmat → windowed npz via the production parser/windowing path.
    Returns the scene-batch count (after optional trimming)."""
    from socialways_tpu.data.parsers import BIWIParser
    from socialways_tpu.data.windowing import create_dataset

    parser = BIWIParser()
    parser.load(obsmat, down_sample=1)
    t_all = np.concatenate(parser.t_data)
    t_range = range(int(t_all.min()), int(t_all.max()) + 1,
                    int(parser.interval))
    obsvs, preds, times, batches = create_dataset(
        parser.p_data, parser.t_data, t_range, n_past, n_next)
    if trim_batches and len(batches) > trim_batches:
        end = int(batches[trim_batches - 1][1])
        obsvs, preds = obsvs[:end], preds[:end]
        times, batches = times[:end], batches[:trim_batches]
    np.savez(out, obsvs=obsvs, preds=preds,
             times=np.asarray(times), batches=batches)
    return len(batches)


def merge_fold(scene_files: Sequence[str], heldout: str, out: str) -> Dict:
    """Concatenate 4 training scenes + held-out LAST (unnormalized — both
    implementations fit their own global scale downstream), trimmed so the
    held-out scene is exactly the last 1/5 of scene batches."""
    parts = [np.load(f) for f in list(scene_files) + [heldout]]
    b_counts = [len(p["batches"]) for p in parts]
    B = min(b_counts)
    obs, prd, tms, bat = [], [], [], []
    off = 0
    for p in parts:
        end = int(p["batches"][B - 1][1])
        obs.append(p["obsvs"][:end])
        prd.append(p["preds"][:end])
        tms.append(p["times"][:end])
        bat.append(p["batches"][:B] + off)
        off += end
    np.savez(out, obsvs=np.concatenate(obs), preds=np.concatenate(prd),
             times=np.concatenate(tms),
             batches=np.concatenate(bat).astype(np.int32))
    n_train = int(bat[3][-1][1])
    return {"batches_per_scene": B, "n_train_samples": n_train,
            "n_test_samples": off - n_train}


def build_all(out_dir: str, seed: int = 0, n_agents: int = 110,
              trim_batches: int = 0) -> Dict[str, int]:
    """Generate all 5 scenes → obsmat → npz (equal batch counts)."""
    os.makedirs(out_dir, exist_ok=True)
    counts = {}
    for scene in SCENES:
        agents = make_scene(scene, n_agents=n_agents, seed=seed)
        om = os.path.join(out_dir, f"obsmat_{scene}.txt")
        write_obsmat(agents, om)
        counts[scene] = scene_npz(om, os.path.join(out_dir,
                                                   f"{scene}-8-12.npz"))
    B = trim_batches or min(counts.values())
    for scene in SCENES:
        om = os.path.join(out_dir, f"obsmat_{scene}.txt")
        counts[scene] = scene_npz(om, os.path.join(out_dir,
                                                   f"{scene}-8-12.npz"),
                                  trim_batches=B)
    return counts


if __name__ == "__main__":
    import sys
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_ethucy"
    print(build_all(out))
