from .params import NrCarrier
from .dlsch_nr import NrDlschConfig, nr_cbsegm, nr_dlsch_decode, nr_dlsch_encode
from .pdsch_nr import NrPdsch
