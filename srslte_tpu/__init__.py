"""srslte_tpu — a TPU-native LTE baseband PHY framework.

A from-scratch JAX/XLA/Pallas implementation of the LTE baseband capabilities of
srsRAN/srsLTE (reference: /root/reference, srsRAN 21.04).  This is not a port:
the reference's per-object C state machines become pure functions over static
shape buckets, its SIMD loops become batched XLA/Pallas kernels, and its
pthread subframe pipeline becomes a throughput-oriented block pipeline sharded
over a TPU mesh.

Layout (mirrors the reference's layer map, see SURVEY.md §1):
  phy.common   — cell/OFDM numerology, Gold/Zadoff-Chu sequences (sequence.c, zc_sequence.c)
  phy.fec      — CRC, conv/Viterbi, turbo + rate matching, block codes (lib/src/phy/fec)
  phy.ofdm     — OFDM modulation/demodulation with CP (lib/src/phy/dft/ofdm.c)
  phy.sync     — PSS/SSS/CFO sync chain (lib/src/phy/sync)
  phy.chest    — channel estimation (lib/src/phy/ch_estimation)
  phy.modem    — modulation mapping + soft demodulation (lib/src/phy/modem)
  phy.mimo     — layer mapping, precoding, equalization (lib/src/phy/mimo)
  phy.phch     — physical channel processors PBCH/PDCCH/PDSCH/... (lib/src/phy/phch)
  phy.channel  — channel emulator: AWGN/fading/delay (lib/src/phy/channel)
  phy.ue/.enb  — high-level RX/TX compositions (lib/src/phy/{ue,enb})
  parallel     — mesh/sharding over carriers, UE channels and time blocks
  ops          — low-level Pallas/XLA kernels shared across modules
  io           — host-side sample IO rails (lib/src/phy/io)
"""

__version__ = "0.1.0"
