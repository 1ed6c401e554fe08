"""Visualizer selection by dataset/dims (reference experiment.py:403-501)."""

from .visualizer import (
    DummyDensityVisualizer,
    ImageDensityVisualizer,
    ThreeDimensionalNonSquareVisualizer,
    TwoDimensionalDensityVisualizer,
    TwoDimensionalNonSquareVisualizer,
)

_IMAGE_DATASETS = ["omniglot", "celeba", "cifar10", "svhn", "fashion-mnist", "mnist"]


def get_visualizer(config, writer, train_data):
    dataset = config["dataset"]
    x_shape = tuple(train_data.shape[1:])
    is_non_square = config.get("model") == "non-square" or config.get("non_square", False)

    if dataset in _IMAGE_DATASETS:
        if config.get("test_metric") or config.get("test_input_images"):
            from .metric_analysis import ImageMetricDensityVisualizer

            return ImageMetricDensityVisualizer(
                writer=writer,
                x_train=train_data,
                num_elbo_samples=config["num_test_elbo_samples"],
            )
        if config.get("test_center"):
            # reference experiment.py:415-421 routing
            from .metric_analysis import ImageCenteringDensityVisualizer

            return ImageCenteringDensityVisualizer(
                writer=writer,
                x_train=train_data,
                num_elbo_samples=config["num_test_elbo_samples"],
            )
        return ImageDensityVisualizer(writer=writer)

    if x_shape == (2,):
        if is_non_square and config.get("latent_dimension") in (1, 2):
            return TwoDimensionalNonSquareVisualizer(
                writer=writer,
                train_data=train_data,
                log_prob_low=config.get("vis_log_prob_min"),
                log_prob_high=config.get("vis_log_prob_max"),
                dataset=dataset,
            )
        return TwoDimensionalDensityVisualizer(
            writer=writer,
            train_data=train_data,
            num_elbo_samples=config.get("num_test_elbo_samples", 10),
        )

    if x_shape == (3,) and is_non_square and config.get("latent_dimension") in (1, 2, 3):
        return ThreeDimensionalNonSquareVisualizer(
            writer=writer,
            train_data=train_data,
            latent_dimension=config.get("latent_dimension"),
        )

    if x_shape in ((4,), (6,)) and is_non_square:
        from .metric_analysis import HighDimensionalNonSquareVisualizer

        return HighDimensionalNonSquareVisualizer(
            writer=writer,
            x_train=train_data,
            num_elbo_samples=config.get("num_test_elbo_samples", 1),
        )

    return DummyDensityVisualizer(writer=writer)


__all__ = [
    "get_visualizer",
    "DummyDensityVisualizer",
    "ImageDensityVisualizer",
    "TwoDimensionalDensityVisualizer",
    "TwoDimensionalNonSquareVisualizer",
    "ThreeDimensionalNonSquareVisualizer",
]
