"""Scale-stress evidence for the session-5 operators: run winnowing
selection + MOSS pair match and the sameAs blocking-key ER over a ×N
amplified documents corpus (ids shifted per copy so the corpus grows,
with every copy retaining its intra-copy duplicate structure) and
report walls + output volumes. The point is the SHAPE at scale: the
per-doc selection is exchange-free and must scale linearly; the two
wedge ops are bounded by Σ n² over their block keys and must not blow
up when the corpus multiplies. Amplification SALTS each copy's tokens
so block structure (dup-group size, fingerprint df) stays constant per
copy while volume grows; the unsalted id-shift variant (every dup
group × REPEAT, all shared fingerprints pushed past max_df so the cap
drops every pair) was run once and recorded in BASELINE.md as the
cap-behavior datapoint.

Usage: python tools/stress_session5.py [sf_dir] [repeat] [num_cpus]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np
import pyarrow as pa
import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEAT = int(sys.argv[2]) if len(sys.argv) > 2 else 50
NCPU = int(sys.argv[3]) if len(sys.argv) > 3 else 32
ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import ray.data as rd

from fcrepo3_rdf_extractor_ray.stages.dedup import (
    winnowing_fingerprints, winnowing_pairs)
from fcrepo3_rdf_extractor_ray.stages.graph import sameas_candidates


def amplified_docs(repeat: int):
    base = rd.read_parquet(os.path.join(SF, "documents.parquet"),
                           columns=["doc_id", "text"])
    n_base = base.count()

    def amplify(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        txt = t["text"].to_numpy(zero_copy_only=False).astype("U")
        out_ids, out_txt = [], []
        for r in range(repeat):
            # per-copy token salt: copy r's tokens become 'r<r>_<tok>',
            # so each copy is an INDEPENDENT sf corpus — dup structure
            # (and so fingerprint df) constant per copy while the
            # corpus multiplies; plain id-shifted duplication instead
            # multiplies every dup group past max_df and the cap
            # (correctly) drops all pairs — recorded in BASELINE.md
            tag = f"r{r}_"
            out_ids.append(ids + r * n_base)
            out_txt.append(np.char.add(
                tag, np.char.replace(txt, " ", " " + tag)))
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_ids)),
            "text": pa.array(np.concatenate(out_txt).astype(object),
                             pa.string())})

    # repartition first so the ×repeat blocks stay worker-sized
    return base.repartition(4 * NCPU).map_batches(
        amplify, batch_format="pyarrow"), n_base


out = {"sf": SF, "repeat": REPEAT, "num_cpus": NCPU}

docs, n_base = amplified_docs(REPEAT)
docs = docs.materialize()
out["n_docs"] = docs.count()

t0 = time.time()
n_fp = winnowing_fingerprints(docs, k=3, w=4).count()
out["winnowing_select_sec"] = round(time.time() - t0, 2)
out["winnowing_selections"] = n_fp

t0 = time.time()
# salted copies: dup structure constant per copy, so pair output and
# wall must scale ~linearly with REPEAT (the wedge stays bounded)
n_pairs = winnowing_pairs(docs, k=3, w=4, min_shared=2,
                          max_df=32).count()
out["winnowing_pairs_sec"] = round(time.time() - t0, 2)
out["winnowing_pairs"] = n_pairs

# sameAs over the alias stream scaled by the same corpus (subjects
# 10·REPEAT wide so block lists stay ~constant while volume grows)
def alias(t: pa.Table) -> pa.Table:
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    subj = np.char.add("al:s", (ids % (10 * REPEAT)).astype("U"))
    pred = np.char.add("kg:p", (ids % 3).astype("U"))
    obj = np.char.add("al:o", (ids % 7).astype("U"))
    return pa.table({"subj": pa.array(subj.tolist(), pa.string()),
                     "pred": pa.array(pred.tolist(), pa.string()),
                     "obj": pa.array(obj.tolist(), pa.string())})


facts = docs.map_batches(alias, batch_format="pyarrow")
t0 = time.time()
n_sa = sameas_candidates(facts, min_shared=2).count()
out["sameas_sec"] = round(time.time() - t0, 2)
out["sameas_pairs"] = n_sa

print(json.dumps(out))
ray.shutdown()
