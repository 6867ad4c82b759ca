from .losses import get_loss_function
from .train import TrainConfig, train
