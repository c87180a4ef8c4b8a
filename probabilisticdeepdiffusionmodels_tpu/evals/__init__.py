from .nll import calculate_likelihood
