from .experiment import (
    generate_ood_metrics,
    load_run,
    ood_classification,
    print_num_params,
    print_schema,
    setup_experiment,
    test_and_visualize,
    train,
)
from .objectives import NonSquareObjective, SquareObjective, get_objective
from .trainer import Trainer
from .writer import DummyWriter, Writer

__all__ = [
    "train", "test_and_visualize", "setup_experiment", "load_run",
    "generate_ood_metrics", "ood_classification", "print_schema",
    "print_num_params", "Trainer", "Writer", "DummyWriter",
    "NonSquareObjective", "SquareObjective", "get_objective",
]
