"""Checkpoint/resume + lineage (the capability gap the north rule closes
— the reference loses the whole run on a crash, SURVEY.md §3.1)."""

import json
import os
import shutil

import pytest

from fcrepo3_rdf_extractor_ray.pipelines.kg import run_kg, run_kg_resumable


@pytest.fixture()
def ckpt_dir(tmp_path):
    d = str(tmp_path / "ckpt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_resume_after_simulated_crash(sf_dir, ckpt_dir):
    # first run "crashes" after 1 of the waves
    out = run_kg_resumable(sf_dir, ckpt_dir, wave_size=2, max_waves=1)
    assert out is None  # incomplete
    committed = os.listdir(os.path.join(ckpt_dir, "stage=extract"))
    committed = [d for d in committed if d.startswith("group=")]
    assert len(committed) == 1

    # resumed run completes the remaining waves only
    ds = run_kg_resumable(sf_dir, ckpt_dir, wave_size=2)
    rows = ds.take_all()

    # result equals the non-resumable pipeline (set semantics)
    want = run_kg(sf_dir).take_all()
    key = lambda r: tuple(sorted(r.items()))
    assert sorted(map(key, rows)) == sorted(map(key, want))

    # manifests committed atomically, with lineage side-output
    groups = sorted(os.listdir(os.path.join(ckpt_dir, "stage=extract")))
    groups = [g for g in groups if g.startswith("group=")]
    assert len(groups) == 4  # 8 shards / wave_size 2
    man = json.load(open(os.path.join(ckpt_dir, "stage=extract", groups[0],
                                      "_MANIFEST.json")))
    assert man["rows"] > 0 and man["shards"]
    lineage = os.path.join(ckpt_dir, "_lineage", "extract.parquet")
    assert os.path.exists(lineage)
    import pyarrow.parquet as pq

    lt = pq.read_table(lineage)
    assert lt.num_rows > 0
    assert set(lt.schema.names) >= {"stage", "input_shard", "triple_count",
                                    "error_count", "wall_ms"}
    # the synthetic corpus plants malformed pages → error_count surfaces them
    import pyarrow.compute as pc

    assert pc.sum(lt["error_count"]).as_py() > 0
    # lineage survives the crash: the wave committed by the FIRST (crashed)
    # invocation must still be present in the merged file, because each
    # wave's lineage commits atomically inside its group checkpoint
    assert set(lt["input_shard"].to_pylist()) == {"0000", "0001", "0002",
                                                  "0003"}
    for g in groups:
        assert os.path.exists(os.path.join(ckpt_dir, "stage=extract", g,
                                           "_LINEAGE.parquet"))


def test_checkpoint_skip_is_idempotent(sf_dir, ckpt_dir):
    ds1 = run_kg_resumable(sf_dir, ckpt_dir, wave_size=8)
    n1 = ds1.count()
    # second call must skip all extraction work and return the same result
    ds2 = run_kg_resumable(sf_dir, ckpt_dir, wave_size=8)
    assert ds2.count() == n1


def test_crash_between_entitymap_and_resolve(sf_dir, ckpt_dir):
    """The SECOND crash boundary: the run dies right after the entity-map
    checkpoint commits, before resolve. The resumed run must re-execute
    NEITHER extraction waves NOR the linking phase (mtimes untouched)
    and still produce the exact run_kg result."""
    out = run_kg_resumable(sf_dir, ckpt_dir, wave_size=2,
                           crash_after_entitymap=True)
    assert out is None  # crashed at the boundary
    em_manifest = os.path.join(ckpt_dir, "stage=entitymap", "_MANIFEST.json")
    assert os.path.exists(em_manifest)  # ...but the map HAS committed
    em_mtime = os.path.getmtime(em_manifest)
    ex_root = os.path.join(ckpt_dir, "stage=extract")
    wave_mtimes = {
        g: os.path.getmtime(os.path.join(ex_root, g, "_MANIFEST.json"))
        for g in os.listdir(ex_root) if g.startswith("group=")}
    assert len(wave_mtimes) == 4

    ds = run_kg_resumable(sf_dir, ckpt_dir, wave_size=2)
    rows = ds.take_all()
    want = run_kg(sf_dir).take_all()
    key = lambda r: tuple(sorted(r.items()))
    assert sorted(map(key, rows)) == sorted(map(key, want))
    assert os.path.getmtime(em_manifest) == em_mtime
    for g, mt in wave_mtimes.items():
        assert os.path.getmtime(
            os.path.join(ex_root, g, "_MANIFEST.json")) == mt


def test_entitymap_checkpoint_reused(sf_dir, ckpt_dir):
    """Mid-pipeline resume: the entity map commits as its own atomic
    checkpoint; a re-invocation reuses it (same mtime) instead of
    re-running the linking phase."""
    run_kg_resumable(sf_dir, ckpt_dir, wave_size=8).count()
    em_dir = os.path.join(ckpt_dir, "stage=entitymap")
    manifest = os.path.join(em_dir, "_MANIFEST.json")
    assert os.path.exists(manifest)
    mtime = os.path.getmtime(manifest)
    run_kg_resumable(sf_dir, ckpt_dir, wave_size=8).count()
    assert os.path.getmtime(manifest) == mtime  # untouched on resume


def test_resume_with_different_wave_size(sf_dir, ckpt_dir):
    """Resume must be exact even when ``wave_size`` differs between the
    crashed and the resuming invocation: group numbering is per-wave, so
    an index-aligned skip would silently drop shards the crashed run
    never extracted (caught live: 8-shard corpus, crash at wave_size=3,
    resume at the default 4 lost one shard). The fix keys resume off the
    committed manifests' input_files."""
    out = run_kg_resumable(sf_dir, ckpt_dir, wave_size=3, max_waves=1)
    assert out is None  # crashed after one wave of 3 shards
    ds = run_kg_resumable(sf_dir, ckpt_dir)  # default wave_size=4
    rows = ds.take_all()
    want = run_kg(sf_dir).take_all()
    key = lambda r: tuple(sorted(r.items()))
    assert sorted(map(key, rows)) == sorted(map(key, want))
    # every input shard is covered by exactly one committed group
    import json as _json

    ex_root = os.path.join(ckpt_dir, "stage=extract")
    covered = []
    for g in sorted(os.listdir(ex_root)):
        if g.startswith("group="):
            man = _json.load(open(os.path.join(ex_root, g,
                                               "_MANIFEST.json")))
            covered.extend(man["input_files"])
    assert len(covered) == len(set(covered)) == 8


def test_resume_rejects_foreign_checkpoint(sf_dir, ckpt_dir, tmp_path):
    """A checkpoint built from different input shards (e.g. another
    corpus/repeat) must be refused, not silently unioned into the run."""
    run_kg_resumable(sf_dir, ckpt_dir, wave_size=8).count()
    # forge a committed group pointing at a file outside the corpus
    import json as _json

    ex_root = os.path.join(ckpt_dir, "stage=extract")
    g = sorted(g for g in os.listdir(ex_root) if g.startswith("group="))[0]
    mp = os.path.join(ex_root, g, "_MANIFEST.json")
    man = _json.load(open(mp))
    man["input_files"] = [str(tmp_path / "not-a-shard.parquet")]
    with open(mp, "w") as f:
        _json.dump(man, f)
    with pytest.raises(ValueError, match="different input shards"):
        run_kg_resumable(sf_dir, ckpt_dir, wave_size=8)
