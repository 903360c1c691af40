from .arguments import T4RecTrainingArguments
from .schedulers import get_scheduler, num_cosine_cycles
from .trainer import Trainer, TrainerState, TrainState

__all__ = [
    "T4RecTrainingArguments",
    "Trainer",
    "TrainerState",
    "TrainState",
    "get_scheduler",
    "num_cosine_cycles",
]
