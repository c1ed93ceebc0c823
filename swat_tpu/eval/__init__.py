from swat_tpu.eval.metrics import calculate_scores, confusion_matrix_update
from swat_tpu.eval.validate import Evaluator, validate_features
