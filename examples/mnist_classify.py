"""MNIST GP classification — examples/src/main/scala/Mnist.scala.

The reference ships an IDX-gzip reader but never wires it to a GP
(Mnist.scala:30-84, SURVEY.md §2.2); here the reader is reproduced *and*
connected to the softmax-Laplace classifier (gpx.models.classify). With no
MNIST files present (this environment has no network), a synthetic
blob-digit fallback exercises the same pipeline.

Usage: python mnist_classify.py [--images t10k-images-idx3-ubyte.gz
                                 --labels t10k-labels-idx1-ubyte.gz]
"""

import argparse
import gzip
import pathlib
import struct

import jax
import jax.numpy as jnp
import numpy as np

from gpx import se, white
from gpx.models import classify


def read_idx_images(path):
    """IDX image reader (magic 2051) — Mnist.scala:30-58."""
    with gzip.open(path, "rb") as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        if magic != 2051:
            raise ValueError(f"bad magic for images: {magic}")
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(n, rows * cols).astype(np.float32) / 255.0


def read_idx_labels(path):
    """IDX label reader (magic 2049) — Mnist.scala:60-84."""
    with gzip.open(path, "rb") as f:
        magic, n = struct.unpack(">II", f.read(8))
        if magic != 2049:
            raise ValueError(f"bad magic for labels: {magic}")
        return np.frombuffer(f.read(), dtype=np.uint8).astype(np.int32)


def synthetic_digits(rng, n_per=30, n_classes=4, dim=16):
    """Gaussian blobs in pixel space — same pipeline, no dataset needed."""
    centers = rng.normal(size=(n_classes, dim)) * 2.0
    xs = np.concatenate(
        [centers[c] + rng.normal(size=(n_per, dim)) * 0.8 for c in range(n_classes)]
    )
    ys = np.repeat(np.arange(n_classes), n_per)
    return xs.astype(np.float32), ys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=str, default=None)
    ap.add_argument("--labels", type=str, default=None)
    ap.add_argument("--n-train", type=int, default=200)
    ap.add_argument("--n-test", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    if args.images and pathlib.Path(args.images).exists():
        xs = read_idx_images(args.images)
        ys = read_idx_labels(args.labels)
        n_classes = 10
    else:
        print("no MNIST files given; using synthetic blob digits")
        xs, ys = synthetic_digits(rng)
        n_classes = 4

    perm = rng.permutation(len(xs))
    xs, ys = xs[perm], ys[perm]
    # the synthetic fallback has 120 points; clamp the split so the
    # default --n-train 200 still leaves a test set instead of 0 points
    n_train = min(args.n_train, max(len(xs) - args.n_test, 1))
    args.n_train = n_train
    x_train, y_train = xs[: args.n_train], ys[: args.n_train]
    x_test, y_test = xs[args.n_train : args.n_train + args.n_test], ys[
        args.n_train : args.n_train + args.n_test
    ]

    kern = se(1.0, 8.0) + white(0.1)
    fitres = classify.fit(jnp.asarray(x_train), kern, jnp.asarray(y_train),
                          n_classes)
    print(f"Laplace fit: {int(fitres.n_iters)} Newton iters, "
          f"logZ = {float(fitres.log_marginal):.1f}")
    probs = classify.predict(
        jax.random.PRNGKey(1), fitres, jnp.asarray(x_train), kern,
        jnp.asarray(x_test),
    )
    pred = np.asarray(probs).argmax(-1)
    acc = (pred == y_test[: len(pred)]).mean()
    print(f"test accuracy on {len(pred)} points: {acc:.2%}")


if __name__ == "__main__":
    main()
