from . import cnn, knn, mk_knn, volume_matching
