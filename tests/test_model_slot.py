"""W1 model-slot proof: a real (pickled) checkpoint artifact travels
``ray.put`` → actor ``__init__`` exactly once per actor, and actor state
is reused across many batches — not re-fetched per batch."""
import datetime as dt
import pickle

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


@ray.remote
class _LoadCounter:
    def __init__(self):
        self.loads = 0
        self.batches = 0

    def incr_load(self):
        self.loads += 1

    def incr_batch(self):
        self.batches += 1

    def stats(self):
        return self.loads, self.batches


def test_ner_model_slot_loads_once_per_actor(ray_session):
    from fcrepo3_rdf_extractor_ray.sources.pages import _page_html
    from fcrepo3_rdf_extractor_ray.stages.ner import detect_mentions

    # a real checkpoint artifact: pickled vocabulary + embedding matrix
    # (pickle round-trip proves it is a serialized model file, not a
    # closure capture; a sklearn/torch checkpoint slots in identically)
    vocab = {f"entity{i}": i for i in range(10_000)}
    emb = np.random.RandomState(0).rand(10_000, 16).astype(np.float32)
    artifact = pickle.loads(pickle.dumps((vocab, emb)))
    ref = ray.put(artifact)

    counter = _LoadCounter.options(name="ner_load_counter").remote()
    ray.get(counter.stats.remote())  # ensure registered before the pool

    n_pages = 64
    t = pa.table({
        "url": pa.array([f"https://ex.org/p/{i}" for i in range(n_pages)],
                        pa.string()),
        "warc_ts": pa.array([dt.datetime(2024, 1, 1)] * n_pages,
                            pa.timestamp("us")),
        "html": pa.array([_page_html(i, "x") for i in range(n_pages)],
                         pa.binary()),
        "lang": pa.array(["en"] * n_pages, pa.string()),
    })
    ds = rd.from_arrow(t).repartition(8)
    out = detect_mentions(ds, concurrency=(1, 2), batch_size=8,
                          weights_ref=ref,
                          load_counter="ner_load_counter").to_pandas()
    loads, batches = ray.get(counter.stats.remote())
    ray.kill(counter)

    assert 1 <= loads <= 2, loads          # one artifact fetch per ACTOR
    assert batches >= 8                     # every block was processed
    assert batches > loads                  # state REUSED across batches
    # the loaded vocabulary actually gates the output (model is in use)
    assert len(out) > 0
    assert set(out["norm"]) <= set(vocab)
