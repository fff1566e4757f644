"""prepare_data: lobe-wise chunk extraction (+ synthetic dataset generator).

The reference README references a `prepare_data.py` that does not exist in
the repo (README.md:18); this rebuilds it from its consumers: the chunk
dataset's expected layout (reference dataset.py:424-432 — per-lobe .mha
chunks under {task}/images|lobes|pseudo_vessels + memo.csv with
uid,patientid,study,ctss) and the inline crop logic of evaluate_scan
(reference job_runner.py:731-750 — lobe bbox + 5 mm border, scan masked to
-2048 outside the lobe).

Also provides a synthetic-dataset generator (full layout, reproducible)
used by the test-suite and benchmark harness, since the clinical data is
not distributable.
"""

from __future__ import annotations

import csv
import os

import numpy as np

from ..core.ops import find_crops_np
from .datasets import RadboudCOVID
from .io import write_mha


def extract_lobe_chunks(db_path, uids=None, task_in="wss", task_out="wss_chunk",
                        crop_border=5, pad_value=-2048, logger=None):
    """Extract per-lobe chunks from the full-scan dataset into the chunk
    layout. Returns the number of chunks written."""
    ds = RadboudCOVID(db_path, uids or RadboudCOVID.get_series_uids(
        os.path.join(db_path, "wss_all.csv")), task=task_in,
        use_masked_scan=False)
    out_root = os.path.join(db_path, task_out)
    img_dir = os.path.join(out_root, "images")
    lobe_dir = os.path.join(out_root, "lobes")
    vessel_dir = os.path.join(out_root, "pseudo_vessels")
    for d in (img_dir, lobe_dir, vessel_dir):
        os.makedirs(d, exist_ok=True)

    rows = []
    n = 0
    for uid in ds.uids:
        sample = ds.get_data(uid)
        scan = sample["#image"]
        lobe = sample["#lobe_reference"]
        vessel = sample["#vessel_reference"]
        meta = sample["meta"]
        pid, sid = uid.split("_")
        patient_meta = meta["patient_meta"]
        for lobe_label in range(1, 6):
            lobe_binary = lobe == lobe_label
            if lobe_binary.sum() < 1:
                continue
            col = RadboudCOVID.metric_k_mapping[lobe_label]
            ctss = int(float(patient_meta.get(col, 0)))
            slices = find_crops_np(lobe_binary, meta["spacing"], crop_border)
            chunk = scan[slices].copy()
            lobe_chunk = lobe_binary[slices].astype(np.uint8)
            vessel_chunk = (vessel[slices] > 0).astype(np.uint8)
            chunk[lobe_chunk == 0] = pad_value
            chunk_uid = f"{uid}-{lobe_label}"
            write_mha(os.path.join(img_dir, f"{chunk_uid}.mha"),
                      chunk.astype(np.int16), spacing=meta["spacing"],
                      origin=meta["origin"], direction=meta["direction"])
            write_mha(os.path.join(lobe_dir, f"{chunk_uid}.mha"),
                      lobe_chunk, spacing=meta["spacing"],
                      origin=meta["origin"], direction=meta["direction"])
            write_mha(os.path.join(vessel_dir, f"{chunk_uid}.mha"),
                      vessel_chunk, spacing=meta["spacing"],
                      origin=meta["origin"], direction=meta["direction"])
            rows.append({"uid": chunk_uid, "patientid": pid, "study": sid,
                         "ctss": ctss})
            n += 1
        if logger:
            logger.info(f"extracted chunks for {uid}")

    with open(os.path.join(out_root, "memo.csv"), "wt", newline="") as fp:
        w = csv.DictWriter(fp, fieldnames=["uid", "patientid", "study", "ctss"])
        w.writeheader()
        w.writerows(rows)
    return n


# ---------------------------------------------------------------------------
# Synthetic dataset (tests / benchmarks / demo).
# ---------------------------------------------------------------------------

def _synth_scan(rng, size, n_lobes=5, lesion_severity=None):
    """A toy thorax: air background, lobe boxes, bright blob lesions whose
    volume fraction tracks the per-lobe severity score."""
    scan = np.full(size, -900, np.int16)
    lobe = np.zeros(size, np.uint8)
    lesion = np.zeros(size, np.uint8)
    vessel = np.zeros(size, np.uint8)
    D, H, W = size
    zs = np.linspace(0, D, n_lobes + 1).astype(int)
    severities = lesion_severity or [int(rng.integers(0, 6))
                                     for _ in range(n_lobes)]
    from ..losses.interval_reg import CTSS_RATIO_LB, CTSS_RATIO_UB
    for li in range(n_lobes):
        z0, z1 = zs[li], zs[li + 1]
        y0, y1 = H // 8, H - H // 8
        x0, x1 = W // 8, W - W // 8
        lobe[z0:z1, y0:y1, x0:x1] = li + 1
        sev = severities[li]
        frac = (CTSS_RATIO_LB[sev] + CTSS_RATIO_UB[sev]) / 2.0
        vol = (z1 - z0) * (y1 - y0) * (x1 - x0)
        target = int(frac * vol)
        if target > 0:
            side = max(1, int(round(target ** (1 / 3))))
            cz = int(rng.integers(z0, max(z0 + 1, z1 - side)))
            cy = int(rng.integers(y0, max(y0 + 1, y1 - side)))
            cx = int(rng.integers(x0, max(x0 + 1, x1 - side)))
            lesion[cz:cz + side, cy:cy + side, cx:cx + side] = 1
        # a thin "vessel" plane
        vy = (y0 + y1) // 2
        vessel[z0:z1, vy:vy + 1, x0:x1] = 1
    scan[lobe > 0] = -800
    scan[vessel > 0] = -100
    scan[lesion > 0] = -350
    lesion &= lobe > 0
    # tiled small-block noise: RNG cost O(64^3) instead of O(D*H*W) — for
    # full-scan sizes the gaussian draw dominated generation time
    tile = rng.normal(0, 10, (min(D, 64), min(H, 64), min(W, 64)))
    reps = [-(-s // t) for s, t in zip(size, tile.shape)]
    noise = np.tile(tile, reps)[:D, :H, :W]
    scan = (scan + noise).astype(np.int16)
    return scan, lobe, lesion, vessel, severities


def make_synthetic_dataset(db_path, n_scans=4, size=(48, 64, 64), seed=0,
                           task="wss"):
    """Create the full RadboudCOVID directory layout with synthetic scans.

    Produces {task}/{images,lobes,lesion,pseudo_vessels}/, wss_all.csv,
    wss_train.csv / val.csv / test.csv, then extracts lobe chunks.
    """
    rng = np.random.default_rng(seed)
    dirs = {d: os.path.join(db_path, task, d)
            for d in ("images", "lobes", "lesion", "pseudo_vessels")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    fieldnames = ["patientid", "study", "lul [0-5]", "lll [0-5]",
                  "rul [0-5]", "rll [0-5]", "rml [0-5]", "cle"]
    rows = []
    uids = []
    for i in range(n_scans):
        pid, sid = f"p{i:03d}", "s1"
        uid = f"{pid}_{sid}"
        uids.append(uid)
        scan, lobe, lesion, vessel, sev = _synth_scan(rng, size)
        spacing = (1.5, 0.8, 0.8)
        for name, arr in (("images", scan), ("lobes", lobe),
                          ("lesion", lesion), ("pseudo_vessels", vessel)):
            write_mha(os.path.join(dirs[name], f"{uid}.mha"), arr,
                      spacing=spacing)
        row = {"patientid": pid, "study": sid, "cle": int(max(sev))}
        for lobe_label, col in RadboudCOVID.metric_k_mapping.items():
            row[col] = sev[lobe_label - 1]
        rows.append(row)

    with open(os.path.join(db_path, "wss_all.csv"), "wt", newline="") as fp:
        w = csv.DictWriter(fp, fieldnames=fieldnames)
        w.writeheader()
        w.writerows(rows)

    n_val = max(1, n_scans // 4)
    splits = {"wss_train.csv": rows[:-n_val] or rows,
              "val.csv": rows[-n_val:],
              "test.csv": rows[-n_val:]}
    for fname, subset in splits.items():
        with open(os.path.join(db_path, fname), "wt", newline="") as fp:
            w = csv.DictWriter(fp, fieldnames=fieldnames)
            w.writeheader()
            w.writerows(subset)

    n_chunks = extract_lobe_chunks(db_path, task_in=task)
    return {"uids": uids, "n_chunks": n_chunks}


def make_synthetic_copd_dataset(db_path, n_scans=4, size=(48, 64, 64),
                                seed=0, emphysema_th=-950):
    """Synthetic COPDGene layout: full scans at db_path/*.mha, lobes under
    derived/seg-lobes-copdgene-approved_Lobes/mha/, meta/ctss.csv with CLE/
    PSE severities, plus pre-extracted lobe chunks (images/lobes/lesions +
    memo.csv with 'cle') for the chunk trainer."""
    rng = np.random.default_rng(seed)
    lobe_dir = os.path.join(db_path,
                            "derived/seg-lobes-copdgene-approved_Lobes/mha")
    meta_dir = os.path.join(db_path, "meta")
    chunk_dirs = {d: os.path.join(db_path, d)
                  for d in ("images", "lobes", "lesions")}
    for d in [lobe_dir, meta_dir, *chunk_dirs.values()]:
        os.makedirs(d, exist_ok=True)

    ctss_rows, memo_rows = [], []
    spacing = (1.5, 0.8, 0.8)
    for i in range(n_scans):
        uid = f"copd{i:03d}"
        scan, lobe, lesion, vessel, sev = _synth_scan(rng, size)
        # emphysema: carve low-HU pockets scaled by severity
        scan = scan.copy()
        scan[lesion > 0] = emphysema_th - 50
        write_mha(os.path.join(db_path, f"{uid}.mha"), scan, spacing=spacing)
        write_mha(os.path.join(lobe_dir, f"{uid}.mha"), lobe, spacing=spacing)
        cle = int(max(sev))
        ctss_rows.append({"SeriesInstanceUID": uid,
                          "CT_Visual_Emph_Severity_P1": cle,
                          "CT_Visual_Emph_Paraseptal_P1": int(min(sev))})
        lung = lobe > 0
        es = np.logical_and(scan < emphysema_th, lung).astype(np.uint8)
        for li in range(1, 6):
            m = lobe == li
            if not m.any():
                continue
            sl = find_crops_np(m, spacing, 5)
            chunk_uid = f"{uid}-{li}"
            chunk = scan[sl].copy()
            chunk[~m[sl]] = -2048
            write_mha(os.path.join(chunk_dirs["images"], f"{chunk_uid}.mha"),
                      chunk.astype(np.int16), spacing=spacing)
            write_mha(os.path.join(chunk_dirs["lobes"], f"{chunk_uid}.mha"),
                      m[sl].astype(np.uint8), spacing=spacing)
            write_mha(os.path.join(chunk_dirs["lesions"], f"{chunk_uid}.mha"),
                      es[sl].astype(np.uint8), spacing=spacing)
            memo_rows.append({"uid": chunk_uid, "cle": sev[li - 1]})

    with open(os.path.join(meta_dir, "ctss.csv"), "wt", newline="") as fp:
        w = csv.DictWriter(fp, fieldnames=list(ctss_rows[0].keys()))
        w.writeheader()
        w.writerows(ctss_rows)
    with open(os.path.join(db_path, "memo.csv"), "wt", newline="") as fp:
        w = csv.DictWriter(fp, fieldnames=["uid", "cle"])
        w.writeheader()
        w.writerows(memo_rows)
    # val/test splits over SeriesInstanceUID
    for fname in ("val.csv", "test.csv"):
        with open(os.path.join(db_path, fname), "wt", newline="") as fp:
            w = csv.DictWriter(fp, fieldnames=list(ctss_rows[0].keys()))
            w.writeheader()
            w.writerows(ctss_rows[-max(1, n_scans // 4):])
    return {"n_scans": n_scans, "n_chunks": len(memo_rows)}


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description="Lobe-chunk extraction")
    p.add_argument("--db_path", type=str, default=None,
                   help="dataset root (contains wss/ and wss_all.csv)")
    p.add_argument("--synthetic", type=str, default=None,
                   help="create a synthetic dataset at this path instead")
    p.add_argument("--n_scans", type=int, default=4)
    p.add_argument("--size", type=int, nargs=3, default=(48, 64, 64))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.synthetic:
        info = make_synthetic_dataset(args.synthetic, args.n_scans,
                                      tuple(args.size), args.seed)
        print(f"synthetic dataset at {args.synthetic}: "
              f"{len(info['uids'])} scans, {info['n_chunks']} chunks")
    elif args.db_path:
        n = extract_lobe_chunks(args.db_path)
        print(f"extracted {n} lobe chunks under {args.db_path}/wss_chunk")
    else:
        p.error("need --db_path or --synthetic")


if __name__ == "__main__":
    main()
