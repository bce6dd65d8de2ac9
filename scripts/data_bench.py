"""Host input-pipeline benchmark on an on-disk moviescope-layout fixture.

Every PERF.md throughput number feeds synthetic, pre-shaped batches; the
real host path is ``JsonlDataset`` (per-sample pickle loads,
features.py) -> WordPiece tokenization -> ``collate`` -> ``BatchIterator``
(thread pool + prefetch thread, loaders.py).  At the round-4 headline the
chip demands ~82 samples/s (batch 64 / 782 ms) from that path — the
reference found it necessary to fork 12 worker *processes* per loader
(ref: data/helpers.py:187-194).  This script answers whether bpx's
thread-based pipeline sustains the demand:

1. Materializes a moviescope-layout dataset at REAL dims (ref layouts,
   dataset.py:94-104,150-159): ``200F_VGG16/{id}.p`` (200, 4096) fp32
   video pickles, ``Melspectrogram/{id}.p`` (96, T~928) mel pickles,
   ``PosterFeatures/{id}.p`` (4096,) poster pickles, ``train.jsonl``
   with real-length synopses (~150-400 words) tokenized by the real
   WordPiece path against a 30k-entry vocab.txt.
2. Measures, per ``--workers`` value:
   * raw epoch throughput: samples/s through
     JsonlDataset -> collate -> BatchIterator (prefetch on);
   * overlapped throughput: the consumer sleeps ``--step-ms`` per batch
     (simulating device compute with the loader prefetching underneath)
     and the report is the added stall per step — the number that says
     how much of a real training step the loader fails to hide.
3. Prints one JSON line per measurement (and ``--json`` aggregates).

Cold-cache numbers: pass --drop-caches to attempt
``/proc/sys/vm/drop_caches`` between runs (needs privileged container;
silently reports ``cold: false`` when unavailable — warm-cache numbers
then model a host whose page cache holds the feature set, which a 7.5 GB
dataset on a 100+ GB TPU host does after epoch 1 anyway).

Usage:
    python scripts/data_bench.py --root /tmp/bpx_databench --n 2048
        [--batch 64] [--step-ms 782] [--workers 0,4,8] [--epoch-batches 24]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GENRES = ["action", "adventure", "animation", "comedy", "crime", "drama",
          "family", "fantasy", "horror", "mystery", "romance", "sci-fi",
          "thriller"]

_SYLLABLES = ("an ba co de el fa go hi in jo ka lu mi no op pa qu ra so tu "
              "un va wo xe yo zu bra cle dri fro gla pli sta tre vli").split()


def _word(rng) -> str:
    return "".join(rng.choice(_SYLLABLES)
                   for _ in range(rng.integers(2, 5)))


def build_vocab_and_words(root: str, rng, n_words: int = 12000,
                          vocab_size: int = 30522):
    """A 30k vocab.txt + the word list synopses draw from.  ~70% of the
    corpus words are whole vocab entries (single-lookup fast path); ~30%
    are word+suffix compounds whose suffix exists only as a ``##`` piece,
    so the greedy WordPiece splitter does real multi-piece work — the
    shape of real English text under bert-base-uncased."""
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    base_words = list(dict.fromkeys(_word(rng) for _ in range(n_words)))
    suffixes = list(dict.fromkeys(_word(rng)[:4] for _ in range(800)))
    vocab = specials + base_words + ["##" + s for s in suffixes]
    # pad to vocab_size with filler entries (never referenced)
    i = 0
    while len(vocab) < vocab_size:
        vocab.append(f"unused{i}")
        i += 1
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab[:vocab_size]) + "\n")

    corpus = list(base_words)
    for _ in range(int(n_words * 0.45)):
        corpus.append(str(rng.choice(base_words)) + str(rng.choice(suffixes)))
    return corpus


def _synopsis(rng, corpus, zipf_idx) -> str:
    n = int(rng.integers(150, 400))
    picks = zipf_idx[rng.integers(0, len(zipf_idx), size=n)]
    return " ".join(corpus[int(i)] for i in picks)


def generate(root: str, n_train: int, seed: int = 0) -> dict:
    """Materialize the fixture; returns the meta dict (also saved)."""
    task_dir = os.path.join(root, "moviescope")
    for sub in ("200F_VGG16", "Melspectrogram", "PosterFeatures"):
        os.makedirs(os.path.join(task_dir, sub), exist_ok=True)
    rng = np.random.default_rng(seed)
    corpus = build_vocab_and_words(root, rng)
    # Zipf-ish rank distribution over the corpus (natural-text shape)
    ranks = np.arange(1, len(corpus) + 1, dtype=np.float64)
    p = (1.0 / ranks)
    p /= p.sum()
    zipf_idx = rng.choice(len(corpus), size=200000, p=p)

    # Random base buffers; per-sample files slice at random offsets with a
    # per-sample scale so every file's bytes differ (content is irrelevant
    # to IO/unpickle cost; regenerating 6.7 GB of fresh randomness is not).
    video_base = rng.random((512, 4096), dtype=np.float32)
    mel_base = rng.random((96, 2048), dtype=np.float32)
    poster_base = rng.random((2, 4096), dtype=np.float32)

    splits = {"train": n_train, "dev": 64, "test": 64}
    sample_id = 0
    t0 = time.perf_counter()
    for split, count in splits.items():
        with open(os.path.join(task_dir, f"{split}.jsonl"), "w") as jf:
            for _ in range(count):
                sid = str(sample_id)
                n_genres = int(rng.integers(1, 4))
                labels = [str(g) for g in
                          rng.choice(GENRES, size=n_genres, replace=False)]
                rec = {"id": sid, "label": labels,
                       "synopsis": _synopsis(rng, corpus, zipf_idx)}
                jf.write(json.dumps(rec) + "\n")

                off = int(rng.integers(0, 312))
                video = video_base[off:off + 200] * np.float32(
                    0.5 + rng.random())
                with open(os.path.join(task_dir, "200F_VGG16",
                                       f"{sid}.p"), "wb") as f:
                    pickle.dump(video, f, protocol=2)
                T = int(np.clip(rng.normal(928, 120), 600, 1200))
                mel = mel_base[:, :T] * np.float32(0.5 + rng.random())
                with open(os.path.join(task_dir, "Melspectrogram",
                                       f"{sid}.p"), "wb") as f:
                    pickle.dump(mel, f, protocol=2)
                poster = poster_base[int(rng.integers(0, 2))] * np.float32(
                    0.5 + rng.random())
                with open(os.path.join(task_dir, "PosterFeatures",
                                       f"{sid}.p"), "wb") as f:
                    pickle.dump(poster, f, protocol=2)
                sample_id += 1
    meta = {"n_train": n_train, "seed": seed,
            "gen_s": round(time.perf_counter() - t0, 1),
            "bytes": _du(task_dir)}
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _du(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def drop_caches() -> bool:
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except OSError:
        return False


def make_loader(root: str, batch: int, n_workers: int, prefetch: int = 2,
                cache: bool = False):
    import dataclasses

    from bpx.config import get_preset
    from bpx.data.loaders import get_data_loaders

    exp = get_preset("moviescope")
    dcfg = dataclasses.replace(
        exp.data, data_path=root, batch_sz=batch, n_workers=n_workers,
        feature_cache=cache,
        bert_vocab_path=os.path.join(root, "vocab.txt"))
    train, _, _, meta = get_data_loaders(dcfg, exp.model, seed=0)
    train.prefetch = prefetch
    return train, meta


def time_epoch(loader, max_batches: int, step_s: float = 0.0) -> dict:
    """Iterate up to max_batches; with step_s the consumer sleeps per
    batch (device-compute stand-in) so throughput shows only the stalls
    the prefetch fails to hide."""
    n = 0
    stalls = []
    t0 = time.perf_counter()
    it = iter(loader)
    while n < max_batches:
        ts = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            break
        stalls.append(time.perf_counter() - ts)
        assert batch["txt"].shape[0] == loader.batch_size
        n += 1
        if step_s:
            time.sleep(step_s)
    wall = time.perf_counter() - t0
    out = {"batches": n, "wall_s": round(wall, 2),
           "stall_ms_per_batch": round(1000 * float(np.mean(stalls[1:])), 1)
           if len(stalls) > 1 else None,
           "first_batch_ms": round(1000 * stalls[0], 1) if stalls else None}
    if step_s:
        # added latency over pure compute
        overhead = wall - n * step_s
        out["added_ms_per_step"] = round(1000 * overhead / max(n, 1), 1)
        out["effective_samples_per_sec"] = round(
            n * loader.batch_size / wall, 2)
    else:
        out["samples_per_sec"] = round(n * loader.batch_size / wall, 2)
    return out


def component_probe(loader, n_items: int = 192) -> dict:
    """Per-component cost: tokenization vs each feature stream vs collate."""
    ds = loader.dataset
    idx = np.random.RandomState(0).permutation(len(ds))[:n_items]
    comp = {}

    t0 = time.perf_counter()
    for i in idx:
        ds._text_ids(ds.data[int(i)])
    comp["tokenize_ms"] = 1000 * (time.perf_counter() - t0) / n_items

    for name, fn in (("video", ds.features.load_video),
                     ("audio", ds.features.load_audio),
                     ("poster", ds.features.load_poster)):
        t0 = time.perf_counter()
        for i in idx:
            fn(ds.data[int(i)])
        comp[f"{name}_ms"] = 1000 * (time.perf_counter() - t0) / n_items

    items = [ds[int(i)] for i in idx[:64]]
    from bpx.data.collate import collate
    t0 = time.perf_counter()
    collate(items, ds.cfg, ds.model_cfg)
    comp["collate64_ms"] = 1000 * (time.perf_counter() - t0)
    return {k: round(v, 2) for k, v in comp.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/bpx_databench")
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--workers", default="0,4,8",
                   help="comma list of thread-pool sizes to measure")
    p.add_argument("--step-ms", type=float, default=782.0,
                   help="simulated device step for the overlap run "
                        "(round-4 headline p50)")
    p.add_argument("--epoch-batches", type=int, default=24)
    p.add_argument("--regen", action="store_true")
    p.add_argument("--drop-caches", action="store_true")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    meta_path = os.path.join(args.root, "meta.json")
    if args.regen or not os.path.exists(meta_path):
        sys.stderr.write(f"generating fixture ({args.n} samples)...\n")
        meta = generate(args.root, args.n)
        sys.stderr.write(f"generated {meta['bytes']/1e9:.2f} GB "
                         f"in {meta['gen_s']}s\n")
    else:
        with open(meta_path) as f:
            meta = json.load(f)

    results = {"fixture": meta, "batch": args.batch,
               "step_ms": args.step_ms, "runs": []}
    demand = args.batch / (args.step_ms / 1000.0)
    results["device_demand_samples_per_sec"] = round(demand, 1)

    loader, _ = make_loader(args.root, args.batch, 0)
    comp = component_probe(loader)
    results["per_item_components"] = comp
    print(json.dumps({"metric": "per_item_components", **comp}), flush=True)

    for w in [int(x) for x in args.workers.split(",")]:
        cold = drop_caches() if args.drop_caches else False
        loader, _ = make_loader(args.root, args.batch, w)
        raw = time_epoch(loader, args.epoch_batches)
        rec = {"metric": "loader_throughput", "n_workers": w, "cold": cold,
               **raw,
               "vs_demand": round(raw["samples_per_sec"] / demand, 2)}
        results["runs"].append(rec)
        print(json.dumps(rec), flush=True)

        cold = drop_caches() if args.drop_caches else False
        loader, _ = make_loader(args.root, args.batch, w)
        ov = time_epoch(loader, args.epoch_batches, step_s=args.step_ms / 1e3)
        rec = {"metric": "overlapped", "n_workers": w, "cold": cold, **ov}
        results["runs"].append(rec)
        print(json.dumps(rec), flush=True)

    # precollated-cache path (bpx.data.cache): first call builds the cache
    t_build = time.perf_counter()
    loader, _ = make_loader(args.root, args.batch, 0, cache=True)
    build_s = time.perf_counter() - t_build
    for metric, step_s in (("loader_throughput", 0.0),
                           ("overlapped", args.step_ms / 1e3)):
        cold = drop_caches() if args.drop_caches else False
        r = time_epoch(loader, args.epoch_batches, step_s=step_s)
        rec = {"metric": metric, "mode": "precollated_cache", "cold": cold,
               "build_s": round(build_s, 1), **r}
        if not step_s:
            rec["vs_demand"] = round(r["samples_per_sec"] / demand, 2)
        results["runs"].append(rec)
        print(json.dumps(rec), flush=True)
        loader, _ = make_loader(args.root, args.batch, 0, cache=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
