from naz_tpu.utils.profiling import phase_timer, trace, GradEvalMeter

__all__ = ["phase_timer", "trace", "GradEvalMeter"]
