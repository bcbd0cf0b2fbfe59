"""Build <name>_{train,test}.npz arrays for the input pipeline from common
raw dataset formats (run wherever the raw data lives, then point
$SOFT_TRUNCATION_DATA_DIR at the output directory).

Supported sources:
  cifar10   <dir with cifar-10-batches-py/>   (python pickle batches)
  imagenet32 <dir with train_data_batch_*.npz / val_data.npz>
  folder    <dir of .png/.jpg images>          (requires PIL)

Usage:
  python tools/make_dataset_npz.py cifar10 /path/to/raw /path/to/out
"""

import os
import pickle
import sys

import numpy as np


def cifar10(src, out):
  base = os.path.join(src, "cifar-10-batches-py")
  xs = []
  for i in range(1, 6):
    with open(os.path.join(base, f"data_batch_{i}"), "rb") as f:
      d = pickle.load(f, encoding="bytes")
    xs.append(d[b"data"])
  train = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
  with open(os.path.join(base, "test_batch"), "rb") as f:
    d = pickle.load(f, encoding="bytes")
  test = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
  np.savez(os.path.join(out, "cifar10_train.npz"),
           images=train.astype(np.uint8))
  np.savez(os.path.join(out, "cifar10_test.npz"),
           images=test.astype(np.uint8))
  print(f"cifar10: {len(train)} train / {len(test)} test")


def imagenet32(src, out):
  xs = []
  for name in sorted(os.listdir(src)):
    if name.startswith("train_data_batch"):
      with np.load(os.path.join(src, name)) as f:
        xs.append(f["data"])
  train = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
  with np.load(os.path.join(src, "val_data.npz")) as f:
    test = f["data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
  np.savez(os.path.join(out, "imagenet32_train.npz"),
           images=train.astype(np.uint8))
  np.savez(os.path.join(out, "imagenet32_test.npz"),
           images=test.astype(np.uint8))
  print(f"imagenet32: {len(train)} train / {len(test)} test")


def folder(src, out, name="custom", size=None):
  from PIL import Image
  imgs = []
  for fn in sorted(os.listdir(src)):
    if fn.lower().endswith((".png", ".jpg", ".jpeg")):
      img = Image.open(os.path.join(src, fn)).convert("RGB")
      if size:
        img = img.resize((size, size), Image.BICUBIC)
      imgs.append(np.asarray(img, dtype=np.uint8))
  arr = np.stack(imgs)
  np.savez(os.path.join(out, f"{name}_train.npz"), images=arr)
  print(f"{name}: {len(arr)} images {arr.shape[1:]}")


def main():
  kind, src, out = sys.argv[1], sys.argv[2], sys.argv[3]
  os.makedirs(out, exist_ok=True)
  {"cifar10": cifar10, "imagenet32": imagenet32, "folder": folder}[kind](
      src, out)


if __name__ == "__main__":
  main()
