"""NH=10^4 smoke test for the host-graph battery (round-5 verdict #3).

Every linkgraph oracle runs at NH=64 where |hosts|^2 folds and driver
fast paths are trivially safe.  This test re-runs the iterative core
(pagerank / bfs / shortest-path / coreness / katz / the multi-word
closure) at NH=10_000 with the distributed branches FORCED
(small_gate=0), asserting they engage, finish, and agree bit-for-bit
with the driver fast paths at the same NH — the regime where the
single-word bit masks, per-column partial tables and driver folds of
round 3 would have broken.

The override must be visible to Ray WORKERS, not just the driver
(module helpers serialize by reference), so the whole run happens in a
subprocess with AERIAL_LG_NH set before import and its own fresh local
Ray session.
"""

import os
import subprocess
import sys

SF = "/root/testdata/sf0.001"

CHILD = r"""
import time

import numpy as np
import ray

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from aerial_conversion_ray.pipelines import linkgraph as lg

assert lg.NH == 10_000, lg.NH
sf = %r
t0 = time.time()

# pagerank: distributed contribution folds (always distributed rounds)
pr = lg.pagerank_hosts(sf)
prs = pr["pr_num"].to_numpy()
assert len(pr) > 1000, len(pr)            # host universe really is >> 64
assert int(prs.max()) > int(np.median(prs))   # hot-host skew survives
t1 = time.time()

# bfs from the hot host: distributed relax rounds.  At NH=10^4 the
# seed host has few out-links (only pages with page_id %% NH == 0), so
# only assert the rounds engage and the seed itself is at distance 0.
bfs = lg.host_bfs(sf).to_pandas()
assert len(bfs) >= 1
assert int(bfs.iloc[0, 1]) == 0 or (bfs.iloc[:, 1] == 0).any()
t2 = time.time()

# shortest path: forced distributed branch == driver fast path
fast = lg.host_shortest_path(sf)
slow = lg.host_shortest_path(sf, small_gate=0)
assert fast.equals(slow)
t3 = time.time()

# full coreness profile: forced distributed peel == driver peel
fast = lg.host_coreness(sf).to_pandas().sort_values("host").reset_index(drop=True)
slow = (
    lg.host_coreness(sf, small_gate=0)
    .to_pandas().sort_values("host").reset_index(drop=True)
)
assert fast.equals(slow)
assert (fast["coreness"] >= 1).all()
t4 = time.time()

# katz: forced distributed level folds == driver levels
fast = lg.host_katz(sf)
slow = lg.host_katz(sf, small_gate=0)
assert fast.equals(slow)
t5 = time.time()

# multi-word closure (W = ceil(n/64) words): driver == distributed
h1, d1, m1 = lg._host_closure(sf, rel_thr_pct=lg.SCC_THR_PCT)
h2, d2, m2 = lg._host_closure(sf, rel_thr_pct=lg.SCC_THR_PCT, small_gate=0)
assert len(h1) > 64 and m1.shape[1] > 1       # genuinely multi-word
assert (h1 == h2).all() and (d1 == d2).all() and (m1 == m2).all()

# landmark closeness: L x n memory, landmark rows only
lm = lg.host_closeness_landmarks(sf, lm_mod=64)
assert len(lm) >= 1 and (lm["n_lm"].to_numpy() >= 1).all()

# three more refactored sparse-partial branches, forced distributed
fast = lg.host_mis(sf)
slow = lg.host_mis(sf, small_gate=0)
assert fast.equals(slow)
fast = lg.host_widest_path(sf)
slow = lg.host_widest_path(sf, small_gate=0)
assert fast.equals(slow)
fast = lg.host_backbone(sf)
slow = lg.host_backbone(sf, small_gate=0)
assert fast.equals(slow)
t6 = time.time()

print(
    "NH10K-TIMINGS pagerank=%%.1f bfs=%%.1f sp=%%.1f coreness=%%.1f "
    "katz=%%.1f closure=%%.1f hosts=%%d"
    %% (t1 - t0, t2 - t1, t3 - t2, t4 - t3, t5 - t4, t6 - t5, len(h1))
)
ray.shutdown()
print("NH10K-OK")
""" % (SF,)


def test_host_battery_at_nh_10k():
    env = dict(os.environ)
    env["AERIAL_LG_NH"] = "10000"
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run(
        [sys.executable, "-c", CHILD],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-4000:]
    assert "NH10K-OK" in res.stdout
