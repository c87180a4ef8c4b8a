from .hooks import VisualizationCallback
