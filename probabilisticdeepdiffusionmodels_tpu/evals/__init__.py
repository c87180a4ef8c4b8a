from .nll import calculate_likelihood
from .prd import knn_precision_recall
