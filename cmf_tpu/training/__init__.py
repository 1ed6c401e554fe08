from .experiment import (
    centering_test_plots,
    generate_ood_metrics,
    load_run,
    ood_classification,
    print_num_params,
    print_model,
    print_schema,
    visualize_two_dim_manifold,
    metric_test_plots,
    setup_experiment,
    test_and_visualize,
    train,
)
from .objectives import NonSquareObjective, SquareObjective, get_objective
from .trainer import Trainer
from .writer import DummyWriter, Writer

__all__ = [
    "train", "test_and_visualize", "setup_experiment", "load_run",
    "generate_ood_metrics", "ood_classification", "print_schema", "print_model", "visualize_two_dim_manifold", "metric_test_plots", "centering_test_plots",
    "print_num_params", "Trainer", "Writer", "DummyWriter",
    "NonSquareObjective", "SquareObjective", "get_objective",
]
