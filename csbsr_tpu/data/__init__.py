from .datasets import CrackDataSet, CrackDataSetTest, SRPretrainDataSet, SyntheticCrackDataSet
from .transforms import TrainTransforms, TestTransforms
from .loader import IterationBasedLoader
