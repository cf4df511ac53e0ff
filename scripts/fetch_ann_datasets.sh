#!/usr/bin/env bash
# Fetch the three real ann-benchmarks datasets whose synthetic twins
# calibrate this repo's ANN tiers (ANN_RECALL*.json), then run the
# same grids against the real data.
#
# This build sandbox has no network (DNS resolution fails for
# ann-benchmarks.com — verified 2026-08-15) and no h5py, so the real
# runs must happen offline; this script is the exact recipe.
#
# Datasets (public, http://ann-benchmarks.com — Aumueller/Bernhardsson/
# Faithfull, "ANN-Benchmarks: A Benchmarking Tool for Approximate
# Nearest Neighbor Algorithms", Information Systems 2020):
#   sift-128-euclidean.hdf5    1,000,000 x 128, euclidean
#   glove-200-angular.hdf5     1,183,514 x 200, angular/cosine
#   fashion-mnist-784-euclidean.hdf5  60,000 x 784, euclidean
#
# Each file holds datasets "train", "test", "neighbors", "distances";
# scripts/ann_benchmark.py --hdf5 reads train/test and recomputes
# exact ground truth over the (possibly --n-truncated) train set, so
# the recall definition matches the synthetic-twin grids exactly
# (distance-threshold recall, ties counted).
#
# Usage: ./scripts/fetch_ann_datasets.sh [data_dir]  (needs: pip install h5py)
set -euo pipefail
DIR="${1:-./ann_data}"
mkdir -p "$DIR"
BASE="http://ann-benchmarks.com"
for f in sift-128-euclidean glove-200-angular fashion-mnist-784-euclidean; do
  [ -f "$DIR/$f.hdf5" ] || curl -fL --retry 3 -o "$DIR/$f.hdf5" "$BASE/$f.hdf5"
done

# Expected artifact shape (one per dataset, merged per index family):
#   {"dataset": ..., "n": ..., "dims": ..., "k": 10, "metric": ...,
#    "grid": [{"nlist":..,"nprobe":..,"recall_at_10":..,"qps":..}...,
#             {"tier":"flat","recall_at_10":..,"qps":..,
#              "single_p50_ms":..,"single_coarse_p50_ms":..}]}
python scripts/ann_benchmark.py --hdf5 "$DIR/sift-128-euclidean.hdf5" \
  --dataset sift-like --queries 100
python scripts/ann_benchmark.py --hdf5 "$DIR/glove-200-angular.hdf5" \
  --dataset glove-like --queries 100 --index flat
python scripts/ann_benchmark.py --hdf5 "$DIR/glove-200-angular.hdf5" \
  --dataset glove-like --queries 100
python scripts/ann_benchmark.py --hdf5 "$DIR/fashion-mnist-784-euclidean.hdf5" \
  --dataset fashion-like --queries 100 --codes float32
