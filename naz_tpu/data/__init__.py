from naz_tpu.data.h5 import load_training_h5, save_training_h5

__all__ = ["load_training_h5", "save_training_h5"]
