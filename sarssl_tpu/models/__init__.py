from .conformer import ConformerBlock, ConformerEncoder
from .transformer import TransformerEncoder
from .encoder import EmbedEncoder, CNNFrontEnd
from .decoder import EmbedDecoder
from .sarssl import SARSSL, MCConformer, SARSSLMultiCH, SARSSLConfig

__all__ = [
    "ConformerBlock", "ConformerEncoder", "TransformerEncoder",
    "EmbedEncoder", "CNNFrontEnd", "EmbedDecoder",
    "SARSSL", "MCConformer", "SARSSLMultiCH", "SARSSLConfig",
]
