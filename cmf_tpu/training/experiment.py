"""Experiment orchestration: config → density + loaders + optimizers +
trainer + writer, and the train / test / OOD entry points.

Contract: reference cmf/experiment.py. TPU-first deltas:
* optimizers are optax chains; the m-flow two-group split
  (non_square_helpers.py:8-28's parameter-generator walk) becomes two masked
  optax transforms over one params pytree;
* cosine LR schedules are per-iteration with T_max = max_epochs × steps/epoch
  (experiment.py:538-555);
* device selection / DataParallel are replaced by an optional data-mesh
  sharding threaded to the loaders and train step.
"""

import json
import os
import subprocess
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import get_schema
from ..data import get_loaders
from ..data.tabular import DATASET_SHAPES as TABULAR_SHAPES
from ..data.image import DATASET_SHAPES as IMAGE_SHAPES
from ..densities import (
    BijectionDensity,
    NonSquareTailDensity,
    PassthroughBeforeEvalDensity,
    SplitDensity,
    WrapperDensity,
)
from ..eval.fid import get_fid_function
from ..eval.metrics import metrics
from ..models import get_density
from .objectives import get_objective
from .trainer import Trainer
from .writer import DummyWriter, Writer

FID_DATASETS = list(IMAGE_SHAPES) + list(TABULAR_SHAPES)


def num_params(params):
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def nonsquare_param_masks(density, params):
    """(recon_mask, likelihood_mask) pytrees for the m-flow two-group split.

    Likelihood params are the NonSquareTailDensity's prior subtree
    (non_square.py:348-364); everything else trains the reconstruction.
    """
    path = []
    node = density
    while not isinstance(node, NonSquareTailDensity):
        if isinstance(node, WrapperDensity):
            path.append("density")
            node = node.density
        elif isinstance(node, SplitDensity):
            path.append("density_1")
            node = node.density_1
        elif isinstance(node, BijectionDensity):
            path.append("prior")
            node = node.prior
        elif hasattr(node, "prior"):
            path.append("prior")
            node = node.prior
        else:
            raise RuntimeError(f"Cannot walk density node {type(node).__name__}")
    path.append("prior")

    def build(mask_tree, keys, value):
        if not keys:
            return jax.tree.map(lambda _: value, mask_tree)
        k = keys[0]
        return {
            kk: (build(vv, keys[1:], value) if kk == k else vv)
            for kk, vv in mask_tree.items()
        }

    all_false = jax.tree.map(lambda _: False, params)
    likelihood_mask = build(all_false, path, True)
    recon_mask = jax.tree.map(lambda m: not m, likelihood_mask)
    return recon_mask, likelihood_mask


def make_optimizer(config, num_steps_per_epoch, mask=None):
    """optax chain matching the reference's torch setup
    (experiment.py:515-555): sgd/adam/adamax, optional grad clipping (torch
    clip-then-step), coupled L2 weight decay (torch-style, added to grads
    before the update), cosine or constant per-iteration LR."""
    lr = config["lr"]
    if config.get("lr_schedule", "none") == "cosine":
        t_max = config["max_epochs"] * num_steps_per_epoch
        schedule = optax.cosine_decay_schedule(init_value=lr, decay_steps=t_max)

        def host_schedule(i):
            # Host-side mirror for telemetry — evaluating the optax schedule
            # eagerly would be a per-epoch device round-trip.
            frac = min(i, t_max) / t_max
            return lr * 0.5 * (1 + np.cos(np.pi * frac))

    else:
        schedule = optax.constant_schedule(lr)

        def host_schedule(i):
            return lr

    parts = []
    if config.get("max_grad_norm") is not None:
        parts.append(optax.clip_by_global_norm(config["max_grad_norm"]))
    if config.get("weight_decay", 0.0):
        parts.append(optax.add_decayed_weights(config["weight_decay"]))

    opt_name = config.get("opt", "adam")
    if opt_name == "adam":
        parts.append(optax.scale_by_adam())
    elif opt_name == "adamax":
        parts.append(optax.scale_by_adamax())
    elif opt_name == "sgd":
        pass  # plain gradient scaling below
    else:
        raise AssertionError(f"Invalid optimizer {opt_name}")
    parts.append(optax.scale_by_learning_rate(schedule))

    opt = optax.chain(*parts)
    if mask is not None:
        opt = optax.masked(opt, mask)
    return opt, host_schedule


def setup_density_and_loaders(config, sharding=None):
    train_loader, valid_loader, test_loader = get_loaders(
        config["dataset"],
        config,
        seed=config["seed"],
        sharding=sharding,
        synthetic=config.get("synthetic_data"),
        data_root=config.get("data_root"),
    )
    schema = get_schema(config)
    density = get_density(schema, x_shape=train_loader.x_shape)
    return density, train_loader, valid_loader, test_loader


def setup_experiment(config, resume_dir=None, testing=False, write_to_disk=True, sharding=None):
    # Matmul precision for coupler nets (trace-time policy; Gram/Cholesky
    # stay fp32 regardless). config "compute_dtype": "float32" | "bfloat16".
    from ..nets import set_compute_dtype

    set_compute_dtype(config.get("compute_dtype", "float32"))

    seed = config["seed"]
    key = jax.random.PRNGKey(seed)
    init_key, train_key = jax.random.split(key)

    density, train_loader, valid_loader, test_loader = setup_density_and_loaders(
        config, sharding=sharding
    )
    variables = density.init(init_key)

    if isinstance(density, PassthroughBeforeEvalDensity):
        # Sample stored passthrough rows from the training set
        # (factory.py:64-72)
        rng = np.random.default_rng(seed)
        n = min(density.num_points, train_loader.num_examples)
        idx = rng.permutation(train_loader.num_examples)[:n]
        variables = density.attach_data(variables, jnp.asarray(train_loader.x[idx]))

    objective = get_objective(config)

    # Optimizers: two masked groups for m-flow, else one
    # (experiment.py:524-536)
    steps_per_epoch = max(len(train_loader), 1)
    if config.get("non_square", False) and config.get("m_flow", False):
        recon_mask, lik_mask = nonsquare_param_masks(density, variables["params"])
        opt_r, sched_r = make_optimizer(config, steps_per_epoch, mask=recon_mask)
        opt_l, sched_l = make_optimizer(config, steps_per_epoch, mask=lik_mask)
        optimizers = [opt_r, opt_l]
        lr_schedules = [sched_r, sched_l]
    else:
        opt, sched = make_optimizer(config, steps_per_epoch)
        optimizers = [opt]
        lr_schedules = [sched]

    # Writer
    if write_to_disk and not config.get("nosave", False):
        if resume_dir is None:
            logdir = os.path.join(config.get("logdir_root", "runs"), config["dataset"])
            make_subdir = True
        else:
            logdir = resume_dir
            make_subdir = False
        writer = Writer(
            logdir=logdir,
            make_subdir=make_subdir,
            tag_group=config["dataset"],
            rundir_tail=config.get("rundir_tail", ""),
            checkpoint_backend=config.get("checkpoint_backend", "pickle"),
        )
    else:
        writer = DummyWriter(logdir=resume_dir)

    # Visualizer (viz module provides selection by dataset/dims)
    from ..viz import get_visualizer

    visualizer = get_visualizer(config, writer, train_loader.x)

    # Loss closures (experiment.py:582-619)
    if config.get("non_square", False):
        if config["dataset"] in FID_DATASETS:
            valid_loss_fn = lambda d, v, x, r: jnp.zeros(x.shape[0])
            test_metrics_fn = lambda d, v, x, r: {"loss": jnp.zeros(x.shape[0])}
        else:
            nves = config["num_valid_elbo_samples"]

            def valid_loss_fn(d, v, x, r):
                return -metrics(d, v, x, nves, rng=r)["elbo"]

            def test_metrics_fn(d, v, x, r):
                info, _ = d.elbo(
                    v, x, rng=r, train=False, add_reconstruction=False,
                    add_diagonal_metric_reg=False, add_offdiagonal_metric_reg=False,
                    likelihood_wt=1.0,
                )
                return {"loss": -info["elbo"]}

    else:
        nves = config["num_valid_elbo_samples"]
        ntes = config["num_test_elbo_samples"]

        def valid_loss_fn(d, v, x, r):
            return -metrics(d, v, x, nves, rng=r)["log-prob"]

        def test_metrics_fn(d, v, x, r):
            return metrics(d, v, x, ntes, rng=r)

    # FID (experiment.py:621-629)
    fid_function = None
    if config["dataset"] in FID_DATASETS and config.get("use_fid", False):
        loader = test_loader if config.get("use_test_fid", False) else train_loader
        feature_fn = None
        if config["dataset"] in IMAGE_SHAPES:
            from ..eval.inception import get_feature_fn

            feature_fn = get_feature_fn(config)
            if (
                getattr(feature_fn, "extractor_kind", None) == "proxy"
                and config["early_stopping"]
                and not testing
            ):
                # FID substitutes for validation loss on image runs
                # (trainer.py:367-371) — with the proxy extractor, early
                # stopping and best_valid selection ride a signal whose
                # correlation with real InceptionV3 FID is unmeasured.
                warnings.warn(
                    "FID-as-validation is using the random-conv PROXY "
                    "extractor: early stopping / best-checkpoint selection "
                    "will follow a relative tracking signal, not "
                    "published-comparable FID. Provide "
                    "CMF_TPU_INCEPTION_WEIGHTS (or torchvision weights) for "
                    "real-FID model selection.",
                    stacklevel=2,
                )
        fid_function = get_fid_function(config, loader, feature_fn)

    trainer = Trainer(
        density=density,
        variables=variables,
        objective=objective,
        optimizers=optimizers,
        lr_schedules=lr_schedules,
        train_loader=train_loader,
        valid_loader=valid_loader,
        test_loader=test_loader,
        writer=writer,
        visualizer=visualizer,
        max_epochs=config["max_epochs"],
        early_stopping=config["early_stopping"],
        max_bad_valid_epochs=config["max_bad_valid_epochs"],
        valid_frequency=2 if config.get("m_flow", False) else 1,
        epochs_per_test=config["epochs_per_test"],
        valid_loss_fn=valid_loss_fn,
        test_metrics_fn=test_metrics_fn,
        fid_function=fid_function,
        should_checkpoint_latest=config.get("should_checkpoint_latest", True),
        should_checkpoint_best_valid=config.get("should_checkpoint_best_valid", True),
        only_testing=testing,
        rng=train_key,
        batch_sharding=sharding,
        profile_dir=config.get("profile_dir"),
    )

    return {
        "density": density,
        "trainer": trainer,
        "writer": writer,
        "visualizer": visualizer,
        "config": config,
    }


def _write_run_metadata(writer, config, trainer):
    writer.write_json("config", {k: v for k, v in config.items()})
    writer.write_json(
        "model",
        {"num_params": num_params(trainer.params), "schema": get_schema(config)},
    )
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True, timeout=10
        ).stdout.strip()
        writer.write_textfile("git-head", head)
        diff = subprocess.run(
            ["git", "diff"], capture_output=True, text=True, timeout=10
        ).stdout
        writer.write_textfile("git-diff", diff)
    except Exception:
        pass


def train(config, resume_dir=None, sharding=None):
    """(experiment.py:44-64)"""
    setup = setup_experiment(config, resume_dir=resume_dir, sharding=sharding)
    if resume_dir is None:
        _write_run_metadata(setup["writer"], config, setup["trainer"])
    setup["trainer"].train()
    return setup


def test_and_visualize(config, resume_dir, overwrite=False, test_fid=False, sharding=None):
    """(experiment.py:67-124): bump FID samples to 50k, skip when metrics.json
    exists unless overwriting, run test, write metrics.json."""
    config = {**config, "num_fid_samples": 50_000}
    if test_fid:
        config["use_test_fid"] = True

    metrics_path = os.path.join(resume_dir, "metrics.json")
    if os.path.exists(metrics_path) and not overwrite:
        print(f"`{metrics_path}' exists; skipping (pass overwrite to rerun)")
        with open(metrics_path) as f:
            return json.load(f)

    setup = setup_experiment(config, resume_dir=resume_dir, testing=True, write_to_disk=False, sharding=sharding)
    trainer = setup["trainer"]
    results = trainer.test()
    if setup["visualizer"] is not None and config["dataset"] not in TABULAR_SHAPES:
        setup["visualizer"].visualize(
            setup["density"], trainer._eval_variables(), 0, write_folder=resume_dir
        )
    with open(metrics_path, "w") as f:
        json.dump(results, f, indent=4)
    return results


OOD_MAPPING_TABLE = {
    "mnist": "fashion-mnist",
    "fashion-mnist": "mnist",
    "cifar10": "svhn",
    "svhn": "cifar10",
}


def generate_ood_metrics(config, resume_dir, sharding=None):
    """4 passes: {in,out-of-sample} × {train,test} (experiment.py:236-275).
    Forces exact log-det and batch 1000 (experiment.py:252-256)."""
    base = {
        **config,
        "log_jacobian_method": "cholesky",
        "train_batch_size": 1000,
        "valid_batch_size": 1000,
        "test_batch_size": 1000,
    }
    in_dataset = config["dataset"]
    out_dataset = OOD_MAPPING_TABLE[in_dataset]
    results = {}
    for dataset, label in [(in_dataset, "in"), (out_dataset, "out")]:
        for use_train, split in [(True, "train"), (False, "test")]:
            cfg = {**base, "dataset": dataset}
            setup = setup_experiment(
                cfg, resume_dir=resume_dir, testing=True, write_to_disk=False, sharding=sharding
            )
            trainer = setup["trainer"]
            loader = trainer.train_loader if use_train else trainer.test_loader
            # Per-run dump named as trainer.py:229-252
            writer = Writer(logdir=resume_dir, make_subdir=False, tee=False)
            trainer.writer = writer
            arr = trainer.test_ood(loader, f"ood_metrics_{split}_{label}")
            results[(label, split)] = arr
            # Per-dataset summary json (single_ood_test, experiment.py:316-338)
            writer.write_json(
                f"ood_metrics_{dataset}_train={use_train}",
                {
                    "likelihood_mean": float(np.nanmean(arr[:, 0])),
                    "reconstruction_error_mean": float(np.nanmean(arr[:, 1])),
                    "n": int(arr.shape[0]),
                },
            )
    return results


def ood_classification(resume_dir):
    """Depth-1 decision stumps on likelihood / reconstruction features
    (experiment.py:278-313). Implemented directly (no sklearn needed)."""

    def best_stump_accuracy(feat_in, feat_out):
        values = np.concatenate([feat_in, feat_out])
        labels = np.concatenate([np.zeros(len(feat_in)), np.ones(len(feat_out))])
        order = np.argsort(values)
        values, labels = values[order], labels[order]
        n = len(labels)
        ones_left = np.cumsum(labels)
        total_ones = ones_left[-1]
        idx = np.arange(1, n + 1)
        # split after position i: left = predict 0, right = predict 1 (or flip)
        acc_a = ((idx - ones_left) + (total_ones - ones_left)) / n
        acc_b = 1 - acc_a
        return float(max(acc_a.max(), acc_b.max()))

    results = {}
    for split in ("train", "test"):
        arr_in = np.load(os.path.join(resume_dir, f"ood_metrics_{split}_in.npy"))
        arr_out = np.load(os.path.join(resume_dir, f"ood_metrics_{split}_out.npy"))
        for j, feature in enumerate(("likelihood", "reconstruction-error")):
            acc = best_stump_accuracy(arr_in[:, j], arr_out[:, j])
            results[f"{split}/{feature}"] = acc
            print(f"OOD classification rate ({split}, {feature}): {acc:.4f}")
    return results


def load_run(resume_dir, sharding=None):
    """Restore config + best_valid-else-latest variables
    (experiment.py:380-400)."""
    with open(os.path.join(resume_dir, "config.json")) as f:
        config = json.load(f)
    setup = setup_experiment(
        config, resume_dir=resume_dir, testing=True, write_to_disk=False, sharding=sharding
    )
    trainer = setup["trainer"]
    return {
        "density": setup["density"],
        "variables": trainer._variables(),
        "config": config,
        "trainer": trainer,
    }


def visualize_two_dim_manifold(config, resume_dir, sharding=None):
    """Decode an 8×8 grid over a 2-D latent into image space
    (experiment.py:127-153)."""
    assert config["dataset"] in ["mnist", "fashion-mnist"]
    assert config["latent_dimension"] == 2
    config = {**config, "test_metric": False, "use_fid": False}

    setup = setup_experiment(
        config, resume_dir=resume_dir, testing=True, write_to_disk=False, sharding=sharding
    )
    density, trainer = setup["density"], setup["trainer"]
    variables = trainer._eval_variables()

    n_grid, lo, hi = 8, -3.0, 3.0
    xs = np.linspace(lo, hi, n_grid)
    ys = np.linspace(hi, lo, n_grid)
    xv, yv = np.meshgrid(xs, ys)
    latents = jnp.asarray(
        np.stack([xv.reshape(-1), yv.reshape(-1)], axis=1), jnp.float32
    )
    images = np.asarray(density.decode(variables, latents, train=False))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    c, h, w = images.shape[1:]
    grid_img = (
        np.clip(images, 0, 256) / 256.0
    ).reshape(n_grid, n_grid, c, h, w).transpose(2, 0, 3, 1, 4).reshape(c, n_grid * h, n_grid * w)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(np.moveaxis(grid_img, 0, 2).squeeze(), cmap="gray" if c == 1 else None,
              extent=[lo, hi, lo, hi])
    ax.set_xlabel("$z_1$")
    ax.set_ylabel("$z_2$")
    fig.savefig(os.path.join(resume_dir, "two_dim_manifold.pdf"))
    import matplotlib.pyplot as _plt

    _plt.close(fig)


def metric_test_plots(config, resume_dir, sharding=None):
    """Run the metric-analysis visualizer battery over a trained run
    (experiment.py:349-364)."""
    config = {**config, "test_metric": True, "use_fid": False}
    setup = setup_experiment(
        config, resume_dir=resume_dir, testing=True, write_to_disk=False, sharding=sharding
    )
    trainer = setup["trainer"]
    setup["visualizer"].visualize(
        setup["density"], trainer._eval_variables(), 0, write_folder=resume_dir
    )


def centering_test_plots(config, resume_dir, sharding=None):
    """Run the centering visualizer over a trained run
    (reference experiment.py:213-231 centering_test_plots)."""
    config = {**config, "test_center": True, "use_fid": False}
    setup = setup_experiment(
        config, resume_dir=resume_dir, testing=True, write_to_disk=False, sharding=sharding
    )
    trainer = setup["trainer"]
    setup["visualizer"].visualize(
        setup["density"], trainer._eval_variables(), 0, write_folder=resume_dir
    )


def describe_density(density, indent=0):
    """Indented density/bijection tree description (torch's module print
    equivalent, experiment.py:341-346)."""
    pad = "  " * indent
    name = type(density).__name__
    lines = [f"{pad}{name}"]
    for attr in ("bijection",):
        child = getattr(density, attr, None)
        if child is not None:
            lines.append(f"{pad}  ({attr}): {type(child).__name__}")
            sub = getattr(child, "bijections", None)
            if sub:
                for b in sub:
                    lines.append(f"{pad}    - {type(b).__name__}")
    for attr in ("density", "density_1", "density_2", "prior"):
        child = getattr(density, attr, None)
        if child is not None and hasattr(child, "elbo"):
            lines.append(f"{pad}  ({attr}):")
            lines.append(describe_density(child, indent + 2))
    return "\n".join(lines)


def print_model(config):
    density, *_ = setup_density_and_loaders({**config, "seed": config.get("seed", 0)})
    print(describe_density(density))


def print_schema(config):
    print(json.dumps(get_schema(config), indent=4))


def print_num_params(config):
    density, train_loader, *_ = setup_density_and_loaders(config)
    variables = density.init(jax.random.PRNGKey(config.get("seed", 0)))
    print(f"Number of parameters: {num_params(variables['params'])}")
