"""One-off: extract all four feature types over the 63-object corpus.
Resumable: caches per-object npz under data_cache/per_obj/."""
import glob, os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from mapping_private_tpu.classify.evaluate import compute_all_features, DEFAULT_DATA

OUT = "/root/repo/data_cache"
os.makedirs(f"{OUT}/per_obj", exist_ok=True)
dirs = sorted(d for d in os.listdir(DEFAULT_DATA) if d.startswith("obj"))
for d in dirs:
    dst = f"{OUT}/per_obj/{d}.npz"
    if os.path.exists(dst):
        continue
    t0 = time.time()
    views = sorted(glob.glob(os.path.join(DEFAULT_DATA, d, "*.pcd")))
    feats = {t: [] for t in "cdgr"}
    for p in views:
        out = compute_all_features(p)
        for t in "cdgr":
            feats[t].append(out[t])
    np.savez_compressed(dst, **{f"features_{t}": np.stack(feats[t]).astype(np.float32) for t in "cdgr"})
    print(f"{d}: {len(views)} views {time.time()-t0:.1f}s", flush=True)

# assemble
F = {t: [] for t in "cdgr"}; L = []; names = []
for ci, d in enumerate(dirs):
    z = np.load(f"{OUT}/per_obj/{d}.npz")
    n = len(z["features_g"])
    for t in "cdgr":
        F[t].append(z[f"features_{t}"])
    L.extend([ci]*n); names.append(d)
np.savez_compressed(f"{OUT}/corpus_features.npz", labels=np.asarray(L, np.int32),
                    names=names, **{f"features_{t}": np.concatenate(F[t]) for t in "cdgr"})
print("DONE")
