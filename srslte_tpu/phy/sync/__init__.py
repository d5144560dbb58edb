from .cfo import cfo_correct, cfo_estimate_cp
from .pss import pss_find, pss_cfo_compute, pss_time
from .sss import sss_find, sss_sequence
from .sync import SyncResult, sync_find
