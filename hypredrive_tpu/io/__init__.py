"""File I/O: IJ ASCII/binary/multipart, MatrixMarket, lsseq containers."""
