from mismo_spark.fs.weights import LevelWeights, ComparerWeights, Weights
from mismo_spark.fs.train import (
    level_proportions,
    train_using_labels,
    train_using_pairs,
)
from mismo_spark.fs.em import train_using_em

__all__ = [
    "LevelWeights",
    "ComparerWeights",
    "Weights",
    "level_proportions",
    "train_using_labels",
    "train_using_pairs",
    "train_using_em",
]
