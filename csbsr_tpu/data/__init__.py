from .datasets import (
    CrackDataSet,
    CrackDataSetTest,
    MassRoadDataset,
    RetinalDataSet,
    RetinalDataSetTest,
    SRPretrainDataSet,
    SubsetView,
    SyntheticCrackDataSet,
    TTICrackDataSetTest,
)
from .transforms import TrainTransforms, TestTransforms
from .loader import IterationBasedLoader
