from yt8m_tpu.data.features import get_feature_names_and_sizes
from yt8m_tpu.data.quantize import dequantize, quantize
from yt8m_tpu.data.tfrecord import tfrecord_iterator, write_tfrecords
