from naz_tpu.train.mle import MLEConfig, TrainResult, train_mle

__all__ = ["MLEConfig", "TrainResult", "train_mle"]
