from naz_tpu.data.h5 import load_training_h5, save_training_h5
from naz_tpu.data.populations import (
    build_grid_training_set,
    extract_bbh_parameters,
    load_posydon_population,
    select_bbh_mergers,
    weighted_population_draws,
)

__all__ = [
    "load_training_h5",
    "save_training_h5",
    "build_grid_training_set",
    "extract_bbh_parameters",
    "load_posydon_population",
    "select_bbh_mergers",
    "weighted_population_draws",
]
