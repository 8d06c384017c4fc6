"""Feature-point matching utilities (reference
`main_other/feature_points_matching_main.py`).

Two matchers over a bing/book image pair:

- `sift_match`: SIFT keypoints + FLANN knn with ratio test (T=0.85) and
  bidirectional cross-check (ref `:13-61`), via OpenCV (cv2 is baked in).
- `vit_patch_match`: ViT patch-token cosine similarity — for every patch of
  image 1 the best-matching patch of image 2 by cosine, top-k pairs (ref
  `:115-132`), computed as ONE batched jitted matmul on device instead of
  the reference's per-patch python loop.

Drawing helpers write PNG files instead of cv2.imshow/visdom windows.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def sift_match(img1_u8: np.ndarray, img2_u8: np.ndarray,
               ratio: float = 0.85
               ) -> Tuple[List[Tuple[float, float]],
                          List[Tuple[float, float]]]:
    """Cross-checked SIFT+FLANN matches; returns (src_pts, dst_pts)."""
    import cv2

    g1 = cv2.cvtColor(img1_u8, cv2.COLOR_RGB2GRAY)
    g2 = cv2.cvtColor(img2_u8, cv2.COLOR_RGB2GRAY)
    sift = cv2.SIFT_create()
    kp1, d1 = sift.detectAndCompute(g1, None)
    kp2, d2 = sift.detectAndCompute(g2, None)
    if d1 is None or d2 is None or len(kp1) < 2 or len(kp2) < 2:
        return [], []
    flann = cv2.FlannBasedMatcher(dict(algorithm=1, trees=5),
                                  dict(checks=50))

    def ratio_filter(matches):
        good = []
        for pair in matches:
            if len(pair) == 2 and pair[0].distance < ratio * \
                    pair[1].distance:
                good.append(pair[0])
        return good

    good1 = ratio_filter(flann.knnMatch(d1, d2, k=2))
    good2 = ratio_filter(flann.knnMatch(d2, d1, k=2))
    back = {(m.queryIdx, m.trainIdx) for m in good2}
    final = [m for m in good1 if (m.trainIdx, m.queryIdx) in back]
    src = [kp1[m.queryIdx].pt for m in final]
    dst = [kp2[m.trainIdx].pt for m in final]
    return src, dst


def vit_patch_match(patch_feats_1, patch_feats_2, top_k: int = 10):
    """Best-cosine patch pairs as one device matmul.

    patch_feats_*: (N, C) ViT patch tokens of the two images (e.g.
    `DinoViT(...)(img)['x_norm_patchtokens'][0]`). Returns a list of
    (similarity, patch_idx_1, patch_idx_2), best first.
    """
    import jax.numpy as jnp

    a = jnp.asarray(patch_feats_1, jnp.float32)
    b = jnp.asarray(patch_feats_2, jnp.float32)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
    sim = a @ b.T                                  # (N, N) on the MXU
    best = jnp.argmax(sim, axis=-1)
    best_sim = jnp.max(sim, axis=-1)
    order = jnp.argsort(-best_sim)[:top_k]
    return [(float(best_sim[i]), int(i), int(best[i])) for i in
            np.asarray(order)]


def patch_to_pixel(patch_idx: int, h: int, w: int, n_patches: int
                   ) -> Tuple[int, int]:
    """Patch index -> (y, x) center pixel (ref `patch2piex`, `:66-72`)."""
    per_dir = n_patches ** 0.5
    ph, pw = h / per_dir, w / per_dir
    row, col = patch_idx // per_dir, patch_idx % per_dir
    return int(0.5 * ph + row * ph), int(0.5 * pw + col * pw)


def match_pair(img1_u8: np.ndarray, img2_u8: np.ndarray, out_dir: str,
               vit_params=None, vit_model=None) -> dict:
    """Run both matchers on an image pair and write visualizations —
    the reference script's per-pair flow
    (`feature_points_matching_main.py:105-140`), PNGs instead of
    cv2.imshow/visdom."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    src, dst = sift_match(img1_u8, img2_u8)
    sift_png = draw_matches(img1_u8, img2_u8, src, dst,
                            f"{out_dir}/sift.png")
    result = {"sift_matches": len(src), "sift_png": sift_png}
    if vit_model is not None and vit_params is not None:
        import jax.numpy as jnp

        f1 = vit_model.apply({"params": vit_params},
                             jnp.asarray(img1_u8[None] / 255.0,
                                         jnp.float32))
        f2 = vit_model.apply({"params": vit_params},
                             jnp.asarray(img2_u8[None] / 255.0,
                                         jnp.float32))
        pairs = vit_patch_match(f1["x_norm_patchtokens"][0],
                                f2["x_norm_patchtokens"][0])
        n = f1["x_norm_patchtokens"].shape[1]
        h, w = img1_u8.shape[:2]
        p1 = [patch_to_pixel(i, h, w, n)[::-1] for _, i, _ in pairs]
        p2 = [patch_to_pixel(j, h, w, n)[::-1] for _, _, j in pairs]
        result["vit_png"] = draw_matches(img1_u8, img2_u8, p1, p2,
                                         f"{out_dir}/vit.png")
        result["vit_pairs"] = pairs
    return result


def draw_matches(img1_u8: np.ndarray, img2_u8: np.ndarray,
                 pts1, pts2, out_path: str, limit: int = 10) -> str:
    """Side-by-side match visualization written to a PNG
    (replaces cv2.imshow, ref `:57-60,88-92`)."""
    import cv2

    canvas = np.concatenate([img1_u8, img2_u8], axis=1).copy()
    for (x1, y1), (x2, y2) in list(zip(pts1, pts2))[:limit]:
        cv2.line(canvas, (int(x1), int(y1)),
                 (int(x2) + img1_u8.shape[1], int(y2)), (255, 255, 0), 2)
    cv2.imwrite(out_path, cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
    return out_path


def run_dataset(data_dir: str, out_dir: str, mask_dir=None,
                canvas: int = 512, vit_params=None, vit_model=None,
                limit: int = 0) -> list:
    """Match every bing/book pair of a dataset directory via the paired
    TileDataset item (the reference workflow iterates the 4-tuple loader,
    `feature_points_matching_main.py:64-75` over
    `archaeological_georgia_biostyle_dataloader.py:51-112`)."""
    import os

    from semisupervisedobjectdetection_tpu.data.tiles import TileDataset

    ds = TileDataset(data_dir, mask_dir, canvas=canvas,
                     has_mask=mask_dir is not None, pair=True)
    results = []
    n = min(len(ds), limit) if limit else len(ds)
    for i in range(n):
        bing, _, book, _ = ds[i]
        pair_dir = os.path.join(out_dir, ds.ids[i])
        os.makedirs(pair_dir, exist_ok=True)
        results.append({"id": ds.ids[i],
                        **match_pair(bing, book, pair_dir,
                                     vit_params=vit_params,
                                     vit_model=vit_model)})
    return results


if __name__ == "__main__":
    import argparse

    from PIL import Image

    p = argparse.ArgumentParser(
        description="SIFT/ViT feature matching: two images, or every "
                    "bing/book pair of a dataset dir (--dataset)")
    p.add_argument("paths", nargs="*", help="img1 img2 [out_dir]")
    p.add_argument("--dataset", help="dataset dir with {id}bing.png + "
                   "{id}book.jpg pairs")
    p.add_argument("--masks", default=None)
    p.add_argument("--out", default="figures/matches")
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()
    if args.dataset:
        for r in run_dataset(args.dataset, args.out, args.masks,
                             limit=args.limit):
            print(r)
    else:
        a = np.asarray(Image.open(args.paths[0]).convert("RGB"))
        b = np.asarray(Image.open(args.paths[1]).convert("RGB"))
        out = args.paths[2] if len(args.paths) > 2 else args.out
        print(match_pair(a, b, out))
