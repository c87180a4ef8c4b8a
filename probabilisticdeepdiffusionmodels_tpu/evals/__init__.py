from .is_score import inception_score_from_features, inception_score_from_logits
from .kid import kernel_inception_distance, polynomial_mmd2
from .nll import calculate_likelihood
from .prd import knn_precision_recall
