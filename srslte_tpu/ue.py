"""UE application: full-stack composition (srsue/src/ue.cc equivalent).

Per-TTI receive path over real PHY samples: MIB (sf0), SIB1 (SI-RNTI),
RAR (RA-RNTI), C-RNTI PDCCH blind search for DL assignments (DCI 1A) and UL
grants (DCI 0); DL-SCH MAC demux -> SRB0/SRB1/DRB RLC -> PDCP -> RRC/NAS;
UL path builds PRACH and granted PUSCH subframes (msg3, RRC, NAS, data).

Conventions shared with EnbApp: CFI 2, PRACH at tti % 10 == 1, msg3 grant
fixed (carried in the RAR), PUSCH 4 TTIs after the grant, SR opportunities
at tti % 10 == 3 on PUCCH format 1 resource n_pucch = crnti % 12.  UL-SCH
PDUs piggyback a short BSR control element so the eNB scheduler tracks the
remaining uplink demand (BSR-driven SchedUl).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mac.pdu import DL_LCID, UL_LCID, MacPdu
from .mac.proc import short_bsr_ce
from .mac.ra import UeRaProc
from .nas.keys import kdf_as_keys, kdf_kenb
from .pdcp import PdcpConfig, PdcpEntity
from .phy.common.params import Cell
from .phy.phch.dci import (format0_1a_size, format1_size,
                           unpack_format0, unpack_format1,
                           unpack_format1a)
from .phy.phch.pbch import Mib
from .phy.phch.pdcch import Pdcch
from .phy.phch.pdsch import Pdsch
from .phy.phch.prach import PrachConfig, prach_gen
from .phy.phch.pucch import Pucch, PucchConfig
from .phy.phch.pusch import Pusch
from .phy.phch.ra_ul import UlGrant
from .phy.ue.ue_dl import UeDl
from .phy.ue.ue_mib import UeMib
from .phy.ue.ue_ul import UeUl
from .rlc import RlcAm, RlcTm
from .rrc.messages import (ConnectionReconfiguration,
                           ConnectionReconfigurationComplete,
                           ConnectionRequest, ConnectionSetup,
                           ConnectionSetupComplete, DlInformationTransfer,
                           RrcSecurityModeCommand, RrcSecurityModeComplete,
                           Sib1, UlInformationTransfer, rrc_pack, rrc_unpack)
from .security import EEA2, EIA2
from .ue_stack import UeNas

SI_RNTI = 0xFFFF
RA_RNTI = 0x0002
CFI = 2
MSG3_GRANT = UlGrant(prb_start=1, n_prb=4, mcs=4)
SR_SF = 3  # SR opportunities at tti % 5 == 3 (sr-ConfigIndex period-5 analog)


@dataclass
class UlTx:
    tti: int
    kind: str  # "prach" | "pusch"
    grant: UlGrant | None = None
    payload: bytes = b""
    preamble: int = 0


class UeApp:
    def __init__(self, cell: Cell, nas: UeNas):
        self.cell = cell
        self.nas = nas
        self.ue_dl = UeDl(cell)
        self.ue_ul = UeUl(cell)
        self.prach_cfg = PrachConfig(cell.ofdm, zero_corr_cfg=7)
        self.ra = UeRaProc()
        self.state = "mib"
        self.mib: Mib | None = None
        self.sib1: Sib1 | None = None
        self.crnti = 0
        self.srb0 = RlcTm()
        self.srb1 = RlcAm()
        self.drb1 = RlcAm()
        self.pdcp1: PdcpEntity | None = None
        self.pdcp_drb: PdcpEntity | None = None
        self.rrc_state = "idle"
        self.pending_ul: dict[int, UlTx] = {}
        self.rx_data: list = []
        self._ccch_sdu = b""

    # ---------------- DL ----------------------------------------------------
    def rx_subframe(self, samples, tti: int):
        sf = tti % 10
        if self.state == "mib" and sf == 0:
            ok, mib, phase, ports = UeMib(self.cell.id, self.cell.n_prb
                                          ).decode(samples)
            if ok:
                self.mib = mib
                self.state = "rach_wait"
        grid, ce, info = self.ue_dl.fft_estimate(samples, sf)
        pd = Pdcch(self.cell, CFI, sf)
        size = format0_1a_size(self.cell.n_prb)

        def decode_pdsch_for(dci, rnti):
            grant = dci.grant(self.cell.n_prb, rnti)
            pdsch = Pdsch(self.cell, grant, sf, cfi=CFI, rnti=rnti)
            bits, ok = pdsch.decode(grid, ce, info["noise"])
            if not bool(np.asarray(ok)):
                return None
            return np.packbits(np.asarray(bits)).tobytes()

        # blind searches relevant to the current state (cc_worker.cc:383
        # scope: common space for SI/RA-RNTI, UE-specific + common for the
        # C-RNTI, formats 0/1A at one payload size and format 1 at another)
        # LTE gives at most ONE DL assignment and ONE UL grant per RNTI per
        # TTI; nested candidates can re-detect the same payload at a larger
        # aggregation level (zero-padded CCEs decode as erasures), so stop
        # at the first successful decode — ue_dl.c's duplicate filtering.
        common_rntis = []
        if self.state in ("rach_wait", "rach_sent"):
            common_rntis.append(RA_RNTI)
        common_rntis.append(SI_RNTI)
        for rnti in common_rntis:
            for loc, payload in pd.search_all(grid, ce, rnti, size, Ls=(4, 8)):
                dci1a = unpack_format1a(payload, self.cell.n_prb)
                if dci1a is not None:
                    raw = decode_pdsch_for(dci1a, rnti)
                    if raw is not None:
                        self._handle_dlsch(rnti, raw, tti)
                        break
        if self.crnti:
            got_dl = got_ul = False
            for loc, payload in pd.search(grid, ce, self.crnti, size):
                dci1a = unpack_format1a(payload, self.cell.n_prb)
                if dci1a is not None and not got_dl:
                    raw = decode_pdsch_for(dci1a, self.crnti)
                    if raw is None:
                        continue
                    self._handle_dlsch(self.crnti, raw, tti)
                    got_dl = True
                elif dci1a is None and not got_ul:
                    dci0 = unpack_format0(payload, self.cell.n_prb)
                    if dci0 is not None:
                        self._queue_ul(tti + 4, UlGrant(dci0.rb_start,
                                                        dci0.l_crb,
                                                        dci0.mcs_rv))
                        got_ul = True
                if got_dl and got_ul:
                    break
            # DCI format 1 (RBG type-0 assignments from the eNB scheduler)
            # lives at a distinct payload size in the UE-specific space
            if not got_dl:
                for loc, payload in pd.search(grid, ce, self.crnti,
                                              format1_size(self.cell.n_prb),
                                              include_common=False):
                    dci1 = unpack_format1(payload, self.cell.n_prb)
                    if dci1 is not None:
                        raw = decode_pdsch_for(dci1, self.crnti)
                        if raw is not None:
                            self._handle_dlsch(self.crnti, raw, tti)
                            break
        self.ra.tick()
        self.srb1.tick()
        self.drb1.tick()
        if self.state == "rach_wait" and sf == 0:
            # schedule PRACH for the next tti % 10 == 1
            p = self.ra.start(np.random.default_rng(self.cell.id + tti))
            self.pending_ul[tti + 1] = UlTx(tti + 1, "prach", preamble=p)
            self.state = "rach_sent"

    # ---------------- UL ----------------------------------------------------
    def tx_subframe(self, tti: int):
        """Returns UL samples for this TTI or None."""
        import jax.numpy as jnp

        tx = self.pending_ul.pop(tti, None)
        if tx is None:
            # SR: connected, data waiting, but no grant anywhere in flight
            if (tti % 5 == SR_SF and self.crnti and not self.pending_ul
                    and self.state == "connected"
                    and (self.srb1.get_buffer_state() > 0
                         or self.drb1.get_buffer_state() > 0)):
                pucch = Pucch(self.cell,
                              PucchConfig("1", n_pucch=self.crnti % 12),
                              sf_idx=tti % 10)
                return self.ue_ul.encode_pucch(pucch)
            return None
        if tx.kind == "prach":
            s = prach_gen(self.prach_cfg, tx.preamble)
            out = np.zeros(self.cell.ofdm.sf_len, np.complex64)
            out[: len(s)] = s
            return jnp.asarray(out)
        # PUSCH: fill the TBS from RLC buffers
        pusch = Pusch(self.cell, tx.grant, tti % 10, rnti=self.crnti)
        tbs_bytes = tx.grant.tbs // 8
        payload = tx.payload or self._build_ul_mac(tbs_bytes)
        raw = payload + bytes(tbs_bytes - len(payload))
        bits = np.unpackbits(np.frombuffer(raw, np.uint8))[: tx.grant.tbs]
        return self.ue_ul.encode_pusch(pusch, jnp.asarray(bits))

    def _queue_ul(self, tti: int, grant: UlGrant):
        self.pending_ul[tti] = UlTx(tti, "pusch", grant)

    def _build_ul_mac(self, tbs_bytes: int) -> bytes:
        """Mux the UL-SCH PDU: drain each bearer while the grant has room
        (mux::pdu_get semantics — a pending RLC STATUS PDU must not displace
        the queued SDUs when both fit)."""
        pdu = MacPdu(ul=True)
        room = tbs_bytes - 6  # BSR CE + its subheader + final padding marker
        for lcid, rlc in ((1, self.srb1), (3, self.drb1)):
            while rlc.get_buffer_state() > 0 and room > 6:
                sdu = rlc.read_pdu(room - 3)
                if not sdu:
                    break
                pdu.add_sdu(lcid, sdu)
                room -= len(sdu) + 3
        # short BSR CE: remaining demand so SchedUl keeps (or stops) granting
        remaining = self.srb1.get_buffer_state() + self.drb1.get_buffer_state()
        pdu.add_ce(int(UL_LCID.SHORT_BSR), short_bsr_ce(0, remaining))
        # explicit padding subheader: the parser must not swallow TBS padding
        return pdu.pack(pdu_len=tbs_bytes)

    # ---------------- stack --------------------------------------------------
    def _handle_dlsch(self, rnti: int, raw: bytes, tti: int):
        if rnti == SI_RNTI:
            msg = rrc_unpack(raw, "bcch")
            if isinstance(msg, Sib1):
                self.sib1 = msg
            return
        if rnti == RA_RNTI:
            if self.ra.state != "wait_rar":
                return
            self._ccch_sdu = rrc_pack(ConnectionRequest(
                ue_identity=bytes([self.cell.id & 0xFF]) + np.random.default_rng(
                    id(self) & 0xFFFF).integers(0, 256, 4).astype(np.uint8).tobytes()))
            msg3 = self.ra.rx_rar(raw, ccch_sdu=self._ccch_sdu)
            if msg3 is not None:
                self.crnti = self.ra.temp_crnti
                # msg3 goes on the RAR-granted PUSCH 4 TTIs after the RAR
                self.pending_ul[tti + 4] = UlTx(tti + 4, "pusch", MSG3_GRANT,
                                                payload=msg3.pack())
            return
        # C-RNTI MAC PDU
        pdu = MacPdu.parse(raw)
        for s in pdu.subpdus:
            if s.lcid == int(DL_LCID.CON_RES_ID):
                if self.ra.rx_msg4(MacPdu(subpdus=[s]).pack()):
                    self.state = "connected"
            elif s.lcid == 0:
                self._handle_rrc(rrc_unpack(s.payload, "dl_ccch"))
            elif s.lcid == 1:
                self.srb1.write_pdu(s.payload)
            elif s.lcid == 3:
                self.drb1.write_pdu(s.payload)
        for sdu in self.srb1.rx_sdus[:]:
            self.srb1.rx_sdus.remove(sdu)
            if self.pdcp1 is not None:
                sdu = self.pdcp1.rx(sdu)
                if sdu is None:
                    continue
            self._handle_rrc(rrc_unpack(sdu, "dl_dcch"))
        for sdu in self.drb1.rx_sdus[:]:
            self.drb1.rx_sdus.remove(sdu)
            if self.pdcp_drb is not None:
                pkt = self.pdcp_drb.rx(sdu)
                if pkt is not None:
                    self.rx_data.append(pkt)

    def _handle_rrc(self, msg):
        if isinstance(msg, ConnectionSetup):
            self.rrc_state = "connected"
            nas0 = self.nas.start_attach()
            self.srb1.write_sdu(rrc_pack(ConnectionSetupComplete(nas_pdu=nas0)))
        elif isinstance(msg, DlInformationTransfer):
            for ul in self.nas.rx_nas(msg.nas_pdu):
                self.srb1.write_sdu(rrc_pack(UlInformationTransfer(nas_pdu=ul)))
        elif isinstance(msg, RrcSecurityModeCommand):
            self.srb1.write_sdu(rrc_pack(RrcSecurityModeComplete()))
            kenb = kdf_kenb(self.nas.kasme, 0)
            k_up, k_rrc_int = kdf_as_keys(kenb, EEA2, EIA2)
            self.pdcp1 = PdcpEntity(PdcpConfig(is_srb=True, bearer_id=1,
                                               ea=EEA2, ia=EIA2),
                                    kenb[:16], k_rrc_int, is_ue=True)
            self.pdcp_drb = PdcpEntity(PdcpConfig(is_srb=False, bearer_id=1,
                                                  ea=EEA2), k_up, is_ue=True)
        elif isinstance(msg, ConnectionReconfiguration):
            for ul in self.nas.rx_nas(msg.nas_pdu):
                self.srb1.write_sdu(self.pdcp1.tx(
                    rrc_pack(UlInformationTransfer(nas_pdu=ul))))
            self.srb1.write_sdu(self.pdcp1.tx(
                rrc_pack(ConnectionReconfigurationComplete())))
            self.rrc_state = "reconfigured"

    def send_data(self, packet: bytes):
        """Queue an UL user-plane packet on the DRB."""
        self.drb1.write_sdu(self.pdcp_drb.tx(packet))
