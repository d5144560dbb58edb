"""eNB application: full-stack composition (srsenb/src/enb.cc equivalent).

Per-TTI loop over real PHY samples: DL subframes carry CRS/PSS/SSS, PBCH,
PCFICH, SIB1 (SI-RNTI), RAR (RA-RNTI), and per-UE PDCCH+PDSCH with MAC PDUs
muxed from SRB0 (RLC TM) / SRB1 (RLC AM + PDCP) / DRB1; UL subframes carry
PRACH (detected to RARs) and granted PUSCH (msg3, RRC, NAS, user data).
The MME is attached by direct call (the S1AP-lite boundary).

Channel conventions shared with UeApp (both sides derive them from the cell
config, like the reference's sib/rr configs): CFI 2, PRACH in subframes with
tti % 10 == 1, msg3 grant fixed, periodic UL grants for connected UEs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mac.pdu import DL_LCID, UL_LCID, MacPdu
from .mac.ra import EnbRach
from .pdcp import PdcpConfig, PdcpEntity
from .phy.common.params import Cell
from .phy.enb.enb_dl import EnbDl
from .phy.enb.enb_ul import EnbUl
from .phy.phch.dci import Dci0, Dci1A, pack_format0, pack_format1a
from .phy.phch.pbch import Mib
from .phy.phch.pdcch import Location, Pdcch, ue_locations
from .phy.phch.pdsch import Pdsch
from .phy.phch.prach import PrachConfig, prach_detect
from .phy.phch.pusch import Pusch
from .phy.phch.ra import DlGrant
from .phy.phch.ra_ul import UlGrant
from .rlc import RlcAm, RlcTm
from .rrc.messages import (ConnectionReconfiguration, ConnectionRequest,
                           ConnectionSetup, ConnectionSetupComplete,
                           DlInformationTransfer, RrcSecurityModeCommand,
                           RrcSecurityModeComplete, Sib1,
                           UlInformationTransfer,
                           ConnectionReconfigurationComplete,
                           rrc_pack, rrc_unpack)

SI_RNTI = 0xFFFF
RA_RNTI = 0x0002
CFI = 2
MSG3_GRANT = UlGrant(prb_start=0, n_prb=4, mcs=4)
UL_GRANT = UlGrant(prb_start=0, n_prb=6, mcs=8)
UL_PERIOD = 4  # grant period for connected UEs (TTIs)


@dataclass
class EnbUe:
    crnti: int
    srb0: RlcTm = field(default_factory=RlcTm)
    srb1: RlcAm = field(default_factory=RlcAm)
    drb1: RlcAm = field(default_factory=RlcAm)
    pdcp1: PdcpEntity | None = None
    pdcp_drb: PdcpEntity | None = None
    rrc_state: str = "idle"
    ue_id: int = 0
    pending_ce: bytes | None = None  # contention-resolution CE for msg4
    rx_data: list = field(default_factory=list)  # deciphered DRB SDUs


class EnbApp:
    def __init__(self, cell: Cell, mme=None, mcs_dl: int = 5):
        self.cell = cell
        self.mme = mme
        self.mcs_dl = mcs_dl
        self.enb_dl = EnbDl(cell)
        self.enb_ul = EnbUl(cell)
        self.prach_cfg = PrachConfig(cell.ofdm, zero_corr_cfg=7)
        self.rach = EnbRach()
        self.ues: dict[int, EnbUe] = {}
        self.pending_rar: bytes | None = None
        self.ul_expect: dict[int, tuple] = {}  # tti -> (crnti, grant, is_msg3)
        self.sfn = 0
        self._next_ue_id = 1
        self._pending_nas: dict = {}

    # ---------------- DL ----------------------------------------------------
    def tx_subframe(self, tti: int):
        import jax.numpy as jnp

        sf = tti % 10
        g = self.enb_dl.put_base(self.enb_dl.empty_grids(), sf)
        if sf == 0:
            g = self.enb_dl.put_pbch(g, Mib(self.cell.n_prb, "norm", "1",
                                            self.sfn))
        g = self.enb_dl.put_pcfich(g, sf, CFI)
        pd = Pdcch(self.cell, CFI, sf)
        used = []

        def send_dlsch(rnti: int, payload, common: bool):
            grant = DlGrant.full(self.cell.n_prb, self.mcs_dl)
            pdsch = Pdsch(self.cell, grant, sf, cfi=CFI, rnti=rnti)
            tbs_bytes = grant.tbs // 8
            if isinstance(payload, MacPdu):
                # pad via an explicit padding subheader so the parser can
                # recover exact SDU lengths (36.321 §6.1.2)
                payload = payload.pack(pdu_len=tbs_bytes)
            if len(payload) > tbs_bytes:
                raise ValueError("DL payload exceeds TBS")
            raw = payload + bytes(tbs_bytes - len(payload))
            bits = np.unpackbits(np.frombuffer(raw, np.uint8))[: grant.tbs]
            dci = Dci1A(rb_start=0, l_crb=self.cell.n_prb, mcs=self.mcs_dl)
            # L=4 aligned candidates only (matches the UE's exhaustive search)
            locs = [Location(c, 4) for c in range(0, pd.n_cce - 3, 4)]
            loc = next(l for l in locs
                       if all(not (l.cce < u.cce + u.L and u.cce < l.cce + l.L)
                              for u in used))
            used.append(loc)
            nonlocal g
            g = self.enb_dl.put_pdcch(g, sf, CFI, pack_format1a(dci, self.cell.n_prb),
                                      rnti, loc)
            g = self.enb_dl.put_pdsch(g, pdsch, jnp.asarray(bits))

        # RAR (RA-RNTI) — sent once, 2 TTIs after detection
        if self.pending_rar is not None:
            send_dlsch(RA_RNTI, self.pending_rar, common=True)
            # schedule the msg3 PUSCH 4 TTIs out for the newest temp C-RNTI
            crnti = self.rach.next_crnti - 1
            self.ul_expect[tti + 4] = (crnti, MSG3_GRANT, True)
            self.pending_rar = None
        elif tti % 40 == 5:  # SIB1 broadcast
            send_dlsch(SI_RNTI, rrc_pack(Sib1()), common=True)

        # per-UE DL data + periodic UL grants
        for crnti, ue in self.ues.items():
            pdu = MacPdu()
            n = 0
            if ue.pending_ce is not None:
                pdu.add_ce(int(DL_LCID.CON_RES_ID), ue.pending_ce)
                ue.pending_ce = None
                n += 1
            tbs_bytes = DlGrant.full(self.cell.n_prb, self.mcs_dl).tbs // 8
            for lcid, rlc in ((0, ue.srb0), (1, ue.srb1), (3, ue.drb1)):
                if rlc.get_buffer_state() > 0:
                    sdu = rlc.read_pdu(tbs_bytes - 12)
                    if sdu:
                        pdu.add_sdu(lcid, sdu)
                        n += 1
            if n:
                send_dlsch(crnti, pdu, common=False)
            if ue.rrc_state != "idle" and tti % UL_PERIOD == 2:
                dci0 = Dci0(rb_start=UL_GRANT.prb_start, l_crb=UL_GRANT.n_prb,
                            mcs_rv=UL_GRANT.mcs)
                loc = next(l for l in (Location(c, 4)
                                       for c in range(0, pd.n_cce - 3, 4))
                           if all(not (l.cce < u.cce + u.L and u.cce < l.cce + l.L)
                                  for u in used))
                used.append(loc)
                g = self.enb_dl.put_pdcch(g, sf, CFI,
                                          pack_format0(dci0, self.cell.n_prb),
                                          crnti, loc)
                self.ul_expect[tti + 4] = (crnti, UL_GRANT, False)

        if sf == 9:
            self.sfn = (self.sfn + 1) % 1024
        return self.enb_dl.gen_signal(g)[..., 0, :]

    # ---------------- UL ----------------------------------------------------
    def rx_subframe(self, samples, tti: int):
        """samples: PRACH window (tti%10==1), PUSCH subframe, or None."""
        if samples is None:
            self._tick()
            return
        if tti % 10 == 1 and tti not in self.ul_expect:
            det, metric, toff = prach_detect(self.prach_cfg, samples)
            det = np.asarray(det)
            if det.any():
                idx = np.where(det)[0].tolist()
                tas = [int(np.asarray(toff)[i]) for i in idx]
                self.pending_rar = self.rach.rach_detected(idx, tas)
        elif tti in self.ul_expect:
            crnti, grant, is_msg3 = self.ul_expect.pop(tti)
            pusch = Pusch(self.cell, grant, tti % 10, rnti=crnti)
            bits, ok, _ = self.enb_ul.decode_pusch(samples, pusch)
            if not bool(np.asarray(ok)):
                return
            raw = np.packbits(np.asarray(bits)).tobytes()
            if is_msg3:
                self._handle_msg3(crnti, raw)
            else:
                self._handle_ul_mac(crnti, raw)
        self._tick()

    def _tick(self):
        for ue in self.ues.values():
            ue.srb1.tick()
            ue.drb1.tick()

    # ---------------- stack ----------------------------------------------
    def _handle_msg3(self, crnti: int, raw: bytes):
        if self.rach.rx_msg3(crnti, raw) is None:
            return
        ue = EnbUe(crnti=crnti, ue_id=self._next_ue_id)
        self._next_ue_id += 1
        self.ues[crnti] = ue
        mac3 = MacPdu.parse(raw, ul=True)
        ccch = next(s for s in mac3.subpdus if s.lcid == int(UL_LCID.CCCH))
        req = rrc_unpack(ccch.payload)
        assert isinstance(req, ConnectionRequest)
        # msg4: contention-resolution CE (echo of the CCCH SDU head) +
        # ConnectionSetup on SRB0
        ue.pending_ce = ccch.payload[:6].ljust(6, b"\0")
        ue.srb0.write_sdu(rrc_pack(ConnectionSetup()))
        ue.rrc_state = "setup"

    def _handle_ul_mac(self, crnti: int, raw: bytes):
        ue = self.ues.get(crnti)
        if ue is None:
            return
        pdu = MacPdu.parse(raw, ul=True)
        for s in pdu.subpdus:
            if s.lcid == 1:
                ue.srb1.write_pdu(s.payload)
            elif s.lcid == 3:
                ue.drb1.write_pdu(s.payload)
        # drain SRB1 -> (PDCP) -> RRC
        for sdu in ue.srb1.rx_sdus[:]:
            ue.srb1.rx_sdus.remove(sdu)
            if ue.pdcp1 is not None:
                sdu = ue.pdcp1.rx(sdu)
                if sdu is None:
                    continue
            self._handle_rrc_ul(ue, sdu)
        # drain DRB1 -> PDCP decipher -> user plane
        for sdu in ue.drb1.rx_sdus[:]:
            ue.drb1.rx_sdus.remove(sdu)
            if ue.pdcp_drb is not None:
                pkt = ue.pdcp_drb.rx(sdu)
                if pkt is not None:
                    ue.rx_data.append(pkt)

    def send_data(self, crnti: int, packet: bytes):
        """Queue a DL user-plane packet (SGi -> DRB path)."""
        ue = self.ues[crnti]
        ue.drb1.write_sdu(ue.pdcp_drb.tx(packet))

    def _activate_as_security(self, ue: EnbUe):
        """AS keys from K_eNB (S1AP InitialContextSetup carries it in the
        reference; here it comes from the co-located MME)."""
        from .nas.keys import kdf_as_keys, kdf_kenb
        from .security import EEA2, EIA2

        kasme = self.mme.ues[ue.ue_id].kasme
        kenb = kdf_kenb(kasme, 0)
        k_up, k_rrc_int = kdf_as_keys(kenb, EEA2, EIA2)
        ue.pdcp1 = PdcpEntity(PdcpConfig(is_srb=True, bearer_id=1, ea=EEA2,
                                         ia=EIA2), kenb[:16], k_rrc_int,
                              is_ue=False)
        ue.pdcp_drb = PdcpEntity(PdcpConfig(is_srb=False, bearer_id=1,
                                            ea=EEA2), k_up, is_ue=False)

    def _handle_rrc_ul(self, ue: EnbUe, raw: bytes):
        msg = rrc_unpack(raw)
        if isinstance(msg, ConnectionSetupComplete):
            ue.rrc_state = "connected"
            self._nas_dl(ue, msg.nas_pdu)
        elif isinstance(msg, UlInformationTransfer):
            self._nas_dl(ue, msg.nas_pdu)
        elif isinstance(msg, RrcSecurityModeComplete):
            ue.rrc_state = "secure"
            self._activate_as_security(ue)
            ue.srb1.write_sdu(ue.pdcp1.tx(rrc_pack(ConnectionReconfiguration(
                drb_id=1, nas_pdu=self._pending_nas.pop(ue.crnti, b"")))))
        elif isinstance(msg, ConnectionReconfigurationComplete):
            ue.rrc_state = "rrc_reconfigured"

    def _nas_dl(self, ue: EnbUe, nas_pdu: bytes):
        if not nas_pdu or self.mme is None:
            return
        for dl in self.mme.rx_nas(ue.ue_id, nas_pdu):
            # when NAS reaches "attached", run RRC security then carry the
            # AttachAccept inside the ConnectionReconfiguration (as the
            # reference piggybacks it)
            ctx = self.mme.ues[ue.ue_id]
            if ctx.state == "attached" and ue.rrc_state == "connected":
                self._pending_nas[ue.crnti] = dl
                ue.srb1.write_sdu(rrc_pack(RrcSecurityModeCommand(
                    self.mme.ea, self.mme.ia)))
            else:
                ue.srb1.write_sdu(rrc_pack(DlInformationTransfer(nas_pdu=dl)))
