from . import metrics, synthetic
