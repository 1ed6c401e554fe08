"""Image datasets (uint8 NCHW, {0..255}).

Contract: reference cmf/datasets/image.py:70-199 — raw uint8 channel-first
tensors, a 10% shuffled validation split from the train set, torchvision
backends when local copies exist. Dequantization/logit preprocessing is a
*model* concern (schema preproc layers), not done here — matching the
reference's division of labour.

Air-gapped fallback: ``synthetic=True`` / CMF_TPU_SYNTHETIC_DATA=1 generates a
deterministic structured uint8 stand-in (blobs + textures) at the real
dataset's shape for end-to-end runs and throughput benchmarks.
"""

import os

import numpy as np

DATASET_SHAPES = {
    # name: (channels, H, W, n_train, n_test)
    "mnist": (1, 28, 28, 60_000, 10_000),
    "fashion-mnist": (1, 28, 28, 60_000, 10_000),
    "cifar10": (3, 32, 32, 50_000, 10_000),
    "svhn": (3, 32, 32, 73_257, 26_032),
    "celeba": (3, 64, 64, 162_770, 19_962),
    "omniglot": (1, 28, 28, 25_968, 6_492),
}


def _torchvision_raw(dataset_name, train, data_root):
    """uint8 (N, C, H, W) images + labels via torchvision local copies
    (reference image.py:73-155, download disabled for air-gap safety)."""
    import torchvision

    data_dir = os.path.join(data_root, dataset_name)

    if dataset_name == "cifar10":
        ds = torchvision.datasets.CIFAR10(root=data_dir, train=train, download=False)
        images = np.transpose(np.asarray(ds.data), (0, 3, 1, 2))
        labels = np.asarray(ds.targets)
    elif dataset_name == "svhn":
        ds = torchvision.datasets.SVHN(
            root=data_dir, split="train" if train else "test", download=False
        )
        images = np.asarray(ds.data)
        labels = np.asarray(ds.labels)
    elif dataset_name in ("mnist", "fashion-mnist"):
        cls = {
            "mnist": torchvision.datasets.MNIST,
            "fashion-mnist": torchvision.datasets.FashionMNIST,
        }[dataset_name]
        ds = cls(root=data_dir, train=train, download=False)
        images = np.asarray(ds.data)[:, None]
        labels = np.asarray(ds.targets)
    elif dataset_name == "omniglot":
        import torchvision.transforms as transforms

        transform = transforms.Compose([transforms.Resize((28, 28)), transforms.ToTensor()])
        ds = torchvision.datasets.Omniglot(root=data_dir, download=False, transform=transform)
        n = len(ds)
        idx = range(0, int(n * 0.8)) if train else range(int(n * 0.8), n)
        images = np.stack([(np.asarray(ds[i][0]) * 255).astype(np.uint8) for i in idx])
        labels = np.asarray([ds[i][1] for i in idx])
    elif dataset_name == "celeba":
        import torchvision.transforms as transforms

        transform = transforms.Compose(
            [transforms.CenterCrop(178), transforms.Resize((64, 64)), transforms.ToTensor()]
        )
        ds = torchvision.datasets.ImageFolder(root=data_dir, transform=transform)
        n = len(ds)
        split = int(0.8 * n)
        idx = range(0, split) if train else range(split, n)
        images = np.stack([(np.asarray(ds[i][0]) * 255).astype(np.uint8) for i in idx])
        labels = np.asarray([ds[i][1] for i in idx])
    else:
        raise ValueError(f"Unknown dataset {dataset_name}")

    return images.astype(np.uint8), labels.astype(np.int64)


def _synthetic_raw(dataset_name, train, seed=0, max_n=10_000):
    """Structured deterministic uint8 stand-in (gaussian blobs over gradient
    backgrounds) with the real dataset's shape."""
    c, h, w, n_train, n_test = DATASET_SHAPES[dataset_name]
    n = min(n_train if train else n_test, max_n)
    rng = np.random.default_rng(seed + (0 if train else 1))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    images = np.empty((n, c, h, w), np.uint8)
    labels = rng.integers(0, 10, n)
    for i in range(n):
        cx, cy = rng.uniform(0.2, 0.8, 2) * (w, h)
        sig = rng.uniform(0.08, 0.25) * h
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig**2)))
        base = rng.uniform(0, 0.3) + 0.2 * (xx / w) * rng.uniform(0, 1)
        img = np.clip(base + blob * rng.uniform(0.5, 1.0), 0, 1)
        for ch in range(c):
            scale = rng.uniform(0.6, 1.0)
            images[i, ch] = (img * scale * 255).astype(np.uint8)
    return images, labels.astype(np.int64)


def get_image_datasets(dataset_name, data_root=None, make_valid_dset=True, synthetic=None, seed=0):
    """Returns ((train_x, train_y), (valid_x, valid_y), (test_x, test_y)) as
    uint8/(int64) arrays, valid split = 10% shuffled (image.py:164-184)."""
    if synthetic is None:
        synthetic = os.environ.get("CMF_TPU_SYNTHETIC_DATA", "") == "1"
    root = data_root or os.environ.get("CMF_TPU_DATA_ROOT", "data")

    if synthetic:
        train_images, train_labels = _synthetic_raw(dataset_name, True, seed)
        test_images, test_labels = _synthetic_raw(dataset_name, False, seed)
    else:
        try:
            train_images, train_labels = _torchvision_raw(dataset_name, True, root)
            test_images, test_labels = _torchvision_raw(dataset_name, False, root)
        except Exception as e:  # torchvision raises RuntimeError when absent
            raise FileNotFoundError(
                f"Local copy of `{dataset_name}' not found under `{root}'. "
                "Place the torchvision-format files there, or pass "
                "synthetic=True / set CMF_TPU_SYNTHETIC_DATA=1."
            ) from e

    valid_fraction = 0.1 if make_valid_dset else 0.0
    rng = np.random.default_rng(seed)
    perm = rng.permutation(train_images.shape[0])
    train_images, train_labels = train_images[perm], train_labels[perm]
    valid_size = int(valid_fraction * train_images.shape[0])
    valid_images, valid_labels = train_images[:valid_size], train_labels[:valid_size]
    train_images, train_labels = train_images[valid_size:], train_labels[valid_size:]

    return (
        (train_images, train_labels),
        (valid_images, valid_labels),
        (test_images, test_labels),
    )
