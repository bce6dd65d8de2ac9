"""Training: losses, optimizer/scheduler, jitted steps, epoch loop, metrics."""

from bpx.train.losses import make_loss_fn
from bpx.train.optim import PlateauScheduler, make_optimizer
from bpx.train.state import TrainState
