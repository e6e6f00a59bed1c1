from . import load_data, metrics
