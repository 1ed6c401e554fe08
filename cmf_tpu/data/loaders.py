"""Dataset routing and device-resident batch loaders.

Contract: reference cmf/datasets/loaders.py:21-54 + supervised_dataset.py —
datasets are fully materialised on device (the reference `.to(device)`s whole
tensors and uses num_workers=0), the train loader shuffles and drops the last
partial batch. TPU-native twist: batches can carry a ``NamedSharding`` so each
step's input lands pre-sharded over the data mesh axis
(replacing DataParallel scatter, SURVEY.md §2.18).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .two_d import get_2d_datasets, _GENERATORS as _TWO_D_GENERATORS
from .tabular import get_tabular_datasets, DATASET_SHAPES as TABULAR_SHAPES
from .image import get_image_datasets, DATASET_SHAPES as IMAGE_SHAPES


class ArrayLoader:
    """Iterates minibatches of a device-resident array.

    shuffle+drop_last for training (loaders.py:45); sequential full coverage
    for eval. Batches are placed with ``sharding`` when given.
    """

    def __init__(self, x, batch_size, shuffle=False, drop_last=False, seed=0, sharding=None):
        self.x = x
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._epoch = 0
        self._seed = seed
        self.sharding = sharding
        self._x_dev = None  # lazy device-resident copy for epoch_batches
        # Datasets above this footprint (or stored uint8) stay host-resident
        # and go through the native gather+cast path.
        self.host_resident_bytes = 2 << 30

    def _host_resident(self):
        x = self.x
        return isinstance(x, np.ndarray) and (
            x.dtype == np.uint8 or x.nbytes > self.host_resident_bytes
        )

    @property
    def num_examples(self):
        return self.x.shape[0]

    @property
    def x_shape(self):
        return self.x.shape[1:]

    def __len__(self):
        n = self.num_examples
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = self.num_examples
        if self.shuffle:
            rng = np.random.default_rng((self._seed, self._epoch))
            order = rng.permutation(n)
            self._epoch += 1
        else:
            order = np.arange(n)
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            batch = jnp.asarray(self.x[idx])
            if self.sharding is not None and batch.shape[0] % self.sharding.mesh.size == 0:
                batch = jax.device_put(batch, self.sharding)
            yield batch

    def _device_x(self):
        """One-time upload of the dataset (matching the reference's
        whole-tensor `.to(device)`, supervised_dataset.py:24-30)."""
        if self._x_dev is None:
            x = jnp.asarray(self.x)
            if self.sharding is not None:
                # Keep the dataset itself sharded over the data axis so the
                # per-epoch gather stays device-local.
                from jax.sharding import NamedSharding, PartitionSpec

                x = jax.device_put(
                    x, NamedSharding(self.sharding.mesh, PartitionSpec(*self.sharding.spec))
                )
            self._x_dev = x
        return self._x_dev

    def epoch_batches(self):
        """The whole (shuffled) epoch as one (num_batches, B, ...) device
        array — feeds a ``lax.scan``-ed train epoch (one dispatch per epoch
        instead of one per step; dispatch latency off the hot path).

        Two regimes:
        * device-resident (default): the dataset is uploaded once and the
          per-epoch permutation gather runs on device — only the index
          vector crosses the host boundary;
        * host-resident (uint8 or oversized datasets): the C++ threaded
          gather+cast kernel (data/native) assembles the epoch on host in
          one fused pass, then a single transfer uploads it.
        """
        n = self.num_examples
        nb = n // self.batch_size
        if self.shuffle:
            rng = np.random.default_rng((self._seed, self._epoch))
            order = rng.permutation(n)[: nb * self.batch_size]
            self._epoch += 1
        else:
            order = None

        if self._host_resident():
            from .native import gather_cast

            idx = order if order is not None else np.arange(nb * self.batch_size)
            stacked = jnp.asarray(gather_cast(np.asarray(self.x), idx))
        else:
            x_dev = self._device_x()
            if order is not None:
                stacked = jnp.take(x_dev, jnp.asarray(order), axis=0)
            else:
                stacked = x_dev[: nb * self.batch_size]
        stacked = stacked.reshape(nb, self.batch_size, *self.x.shape[1:])
        if self.sharding is not None and self.batch_size % self.sharding.mesh.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec

            spec = PartitionSpec(None, *self.sharding.spec)
            stacked = jax.device_put(stacked, NamedSharding(self.sharding.mesh, spec))
        return stacked


def get_loaders(dataset, config, seed=0, sharding=None, synthetic=None, data_root=None):
    """name → (train_loader, valid_loader, test_loader) (loaders.py:21-54)."""
    if dataset in _TWO_D_GENERATORS:
        train_x, valid_x, test_x = get_2d_datasets(dataset, seed=seed)
    elif dataset in TABULAR_SHAPES:
        train_x, valid_x, test_x = get_tabular_datasets(
            dataset, data_root=data_root, synthetic=synthetic, seed=seed
        )
    elif dataset in IMAGE_SHAPES:
        (train_x, _), (valid_x, _), (test_x, _) = get_image_datasets(
            dataset, data_root=data_root, synthetic=synthetic, seed=seed
        )
        train_x = train_x.astype(np.float32)
        valid_x = valid_x.astype(np.float32)
        test_x = test_x.astype(np.float32)
    else:
        raise AssertionError(f"Unknown dataset `{dataset}'")

    # Optional split truncation (battery / CI affordance, not a reference
    # feature): caps every split so short synthetic-data studies control
    # steps-per-epoch explicitly.
    max_size = config.get("max_dataset_size")
    if max_size:
        train_x = train_x[: int(max_size)]
        valid_x = valid_x[: int(max_size)]
        test_x = test_x[: int(max_size)]

    train_loader = ArrayLoader(
        train_x, config["train_batch_size"], shuffle=True, drop_last=True,
        seed=seed, sharding=sharding,
    )
    valid_loader = ArrayLoader(valid_x, config["valid_batch_size"], sharding=sharding)
    test_loader = ArrayLoader(test_x, config["test_batch_size"], sharding=sharding)
    return train_loader, valid_loader, test_loader
