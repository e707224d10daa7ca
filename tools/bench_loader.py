"""Input-pipeline throughput bench (VERDICT r2 weak #6).

Measures items/s of CelebAHQDataset + PrefetchLoader (thread vs process
workers, several worker counts) against the device step-time budget, on a
synthetic 1024px CelebA-HQ layout (or --dataset-dir for real data). The
reference feeds its trainer with num_workers=2*batch DataLoader processes
(/root/reference/main.py:190-265); our cv2/TPS/augment __getitem__ is
GIL-heavy, so thread workers can starve the chip — this tool quantifies it.

  python tools/bench_loader.py [--dataset-dir D] [--batch 8] [--image-size 512]
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset-dir", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--count", type=int, default=64, help="synthetic images")
    ap.add_argument("--native-size", type=int, default=1024,
                    help="synthetic on-disk resolution (CelebA-HQ is 1024)")
    ap.add_argument("--batches", type=int, default=4, help="measured batches")
    ap.add_argument("--workers", type=int, nargs="*", default=None,
                    help="default: scaled to the visible cores")
    ap.add_argument("--device-ms", type=float, default=57.0,
                    help="device step budget to compare against (ms/batch)")
    args = ap.parse_args()

    import os

    from reface_tpu.data import CelebAHQConfig, CelebAHQDataset, PrefetchLoader
    from reface_tpu.data.synthetic import make_synthetic_celeba

    cores = os.cpu_count() or 1
    if args.workers is None:
        args.workers = sorted({min(4, cores), cores, 2 * cores})
    print(f"[bench_loader] visible cores: {cores} (worker scaling is "
          f"core-bound; the reference assumes a many-core host, "
          f"num_workers=2*bs)")

    tmp = None
    root = args.dataset_dir
    if root is None:
        tmp = tempfile.TemporaryDirectory()
        root = tmp.name
        print(f"[bench_loader] writing {args.count} synthetic "
              f"{args.native_size}px images ...")
        make_synthetic_celeba(root, count=args.count, size=args.native_size)

    ds = CelebAHQDataset(CelebAHQConfig(
        dataset_dir=root, state="train", image_size=args.image_size,
        train_count=args.count,
    ))

    # single-thread baseline: the per-item CPU cost
    t0 = time.perf_counter()
    for i in range(min(8, len(ds))):
        ds[i]
    per_item_ms = (time.perf_counter() - t0) / min(8, len(ds)) * 1e3

    need = args.batch / (args.device_ms / 1e3)  # items/s to keep the chip fed
    print(f"[bench_loader] per-item cost {per_item_ms:.1f} ms; need "
          f"{need:.0f} items/s for batch {args.batch} @ {args.device_ms} ms/step")

    results = []
    for mode in ("thread", "process"):
        for nw in args.workers:
            loader = PrefetchLoader(ds, batch_size=args.batch, shuffle=True,
                                    num_workers=nw, worker_mode=mode)
            it = iter(loader)
            next(it)  # warm (forks the process pool on first batch)
            n = 0
            t0 = time.perf_counter()
            for b in it:
                n += args.batch
                if n >= args.batches * args.batch:
                    break
            dt = time.perf_counter() - t0
            loader.close()
            ips = n / dt
            row = {
                "mode": mode, "workers": nw, "items_per_s": round(ips, 1),
                "margin_vs_device": round(ips / need, 2),
            }
            results.append(row)
            print(json.dumps(row))

    best = max(results, key=lambda r: r["items_per_s"])
    print(json.dumps({"best": best, "per_item_ms": round(per_item_ms, 1),
                      "need_items_per_s": round(need, 1), "cores": cores}))
    if tmp:
        tmp.cleanup()


if __name__ == "__main__":
    main()
