from . import knn, volume_matching
