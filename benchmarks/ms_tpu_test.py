import time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
sys.path.insert(0, "/root/repo/tests")
from helpers import make_engine_and_oracle

def stamp(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

rng = np.random.default_rng(0)
pts0 = rng.uniform(0, 1, (50000, 3)).astype(np.float32)
pts1 = rng.uniform(0, 1, (30000, 3)).astype(np.float32)
active = [(0, 0, True), (0, 1, True), (1, 0, True), (1, 1, False)]
eng, orc = make_engine_and_oracle([(pts0, None), (pts1, None)],
                                  search_radius=0.045, active=active)
stamp("engine run (TPU, pallas multi-set)")
eng.run()
stamp(f"done; stats {eng._last_stats}")
from treensearch_tpu import native_oracle as no
for (si, sj, pi, pj) in ((0, 0, pts0, pts0), (0, 1, pts0, pts1), (1, 0, pts1, pts0)):
    counts, offs, nbrs = no.grid_search_pair(pi, pj, radius=0.045, same_set=(si == sj))
    ec, en = eng.get_neighbors(si, sj)
    ec, en = np.asarray(ec), np.asarray(en)
    assert np.array_equal(ec, counts), (si, sj)
    for i in range(0, pi.shape[0], 37):
        got = np.sort(en[i][:ec[i]]); want = np.sort(nbrs[offs[i]:offs[i+1]])
        assert np.array_equal(got, want), (si, sj, i)
stamp("multi-set pallas parity EXACT (native oracle, 3 pairs)")

# variable+symmetric multi-set
rad0 = rng.uniform(0.035, 0.05, 50000).astype(np.float32)
rad1 = rng.uniform(0.035, 0.05, 30000).astype(np.float32)
eng2, orc2 = make_engine_and_oracle([(pts0, rad0), (pts1, rad1)],
                                    symmetric=True)
eng2.run()
cat_p = np.concatenate([pts0, pts1]); cat_r = np.concatenate([rad0, rad1])
for (si, sj, pi, ri, off_j, nj) in ((0, 0, pts0, rad0, 0, 50000), (0, 1, pts0, rad0, 50000, 30000),
                                    (1, 0, pts1, rad1, 0, 50000), (1, 1, pts1, rad1, 50000, 30000)):
    pj = cat_p[off_j:off_j+nj]; rj = cat_r[off_j:off_j+nj]
    counts, offs, nbrs = no.grid_search_pair(pi, pj, radii_i=ri, radii_j=rj,
                                             symmetric=True, same_set=(si == sj))
    ec, en = eng2.get_neighbors(si, sj)
    ec, en = np.asarray(ec), np.asarray(en)
    assert np.array_equal(ec, counts), (si, sj, int(np.sum(ec != counts)))
    for i in range(0, pi.shape[0], 53):
        got = np.sort(en[i][:ec[i]]); want = np.sort(nbrs[offs[i]:offs[i+1]])
        assert np.array_equal(got, want), (si, sj, i)
stamp(f"variable symmetric multi-set parity EXACT; stats {eng2._last_stats}")
