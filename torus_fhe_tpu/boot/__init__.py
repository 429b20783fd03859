from . import api, bootstrap, gates, keyswitch, pack, public_sample
